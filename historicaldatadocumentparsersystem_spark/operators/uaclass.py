"""User-agent classification compiled to Spark builtins — the JVM
side of ``extractor/uax.py``'s rule tables.

Everything here is MAP-ONLY whole-stage-codegen work (instr chains
+ regexp_extract); at 100 TB the scan cost is the operator cost,
like the PII/idents families. The rule tuples are imported, never
re-typed, and :func:`ua_case_sql` renders the SAME tuples as DuckDB
CASE chains for the twin (host_security_posture precedent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..extractor.uax import (BOT_MARKERS, BOT_NAME_RE, BROWSER_RULES,
                             OS_RULES)


def _hits(ua: Column, needle: str) -> Column:
    return F.instr(ua, needle) > 0


def _rule_cond(ua: Column, any_of, all_of, none_of) -> Column:
    cond = None
    for n in any_of:
        cond = _hits(ua, n) if cond is None else cond | _hits(ua, n)
    for n in all_of:
        cond = cond & _hits(ua, n)
    for n in none_of:
        cond = cond & ~_hits(ua, n)
    return cond


def classify_cols(ua: Column) -> dict[str, Column]:
    """ua -> {family, version_major, os, is_bot, bot_name} Columns,
    NULL-propagating exactly like uax.classify(None)."""
    fam = ver = None
    for name, any_of, all_of, none_of, vres in BROWSER_RULES:
        cond = _rule_cond(ua, any_of, all_of, none_of)
        v = F.coalesce(*[
            F.nullif(F.regexp_extract(ua, vre, 1), F.lit(""))
            for vre in vres]).try_cast("int")
        fam = (F.when(cond, name) if fam is None
               else fam.when(cond, name))
        ver = F.when(cond, v) if ver is None else ver.when(cond, v)
    osc = None
    for name, any_of in OS_RULES:
        cond = _rule_cond(ua, any_of, (), ())
        osc = (F.when(cond, name) if osc is None
               else osc.when(cond, name))
    low = F.lower(ua)
    bot = None
    for m in BOT_MARKERS:
        bot = _hits(low, m) if bot is None else bot | _hits(low, m)
    bot_name = F.when(
        bot, F.nullif(F.regexp_extract(low, BOT_NAME_RE, 1),
                      F.lit("")))
    return {"family": fam, "version_major": ver, "os": osc,
            "is_bot": bot, "bot_name": bot_name}


def classify_ua(df: DataFrame, ua_col: str = "user_agent"
                ) -> DataFrame:
    cols = classify_cols(F.col(ua_col))
    return df.withColumns(cols)


# ---------------------------------------------------------------- SQL twin

def _sql_cond(e: str, any_of, all_of, none_of) -> str:
    parts = " OR ".join(
        f"instr({e}, '{n}') > 0" for n in any_of)
    cond = f"({parts})"
    for n in all_of:
        cond += f" AND instr({e}, '{n}') > 0"
    for n in none_of:
        cond += f" AND NOT instr({e}, '{n}') > 0"
    return cond


def ua_case_sql(e: str) -> dict[str, str]:
    """DuckDB expressions for the five classification columns over
    expression ``e`` — generated from the imported rule tables."""
    fam, ver, osc = [], [], []
    for name, any_of, all_of, none_of, vres in BROWSER_RULES:
        cond = _sql_cond(e, any_of, all_of, none_of)
        fam.append(f"WHEN {cond} THEN '{name}'")
        alts = ", ".join(
            f"nullif(regexp_extract({e}, '{vre}', 1), '')"
            for vre in vres)
        ver.append(
            f"WHEN {cond} THEN try_cast(coalesce({alts}) AS int)")
    for name, any_of in OS_RULES:
        osc.append(f"WHEN {_sql_cond(e, any_of, (), ())} "
                   f"THEN '{name}'")
    low = f"lower({e})"
    bot = "(" + " OR ".join(
        f"instr({low}, '{m}') > 0" for m in BOT_MARKERS) + ")"
    nl = "\n              "
    return {
        "family": f"CASE {nl.join(fam)} END",
        "version_major": f"CASE {nl.join(ver)} END",
        "os": f"CASE {nl.join(osc)} END",
        "is_bot": bot,
        "bot_name": (f"CASE WHEN {bot} THEN nullif(regexp_extract("
                     f"{low}, '{BOT_NAME_RE}', 1), '') END"),
    }
