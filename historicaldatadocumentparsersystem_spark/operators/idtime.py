"""ID-embedded timestamp mining — the distributed side of
``extractor/idtimex.py``.

One GENERATOR, two dialects: :func:`id_time_exprs` renders the
classification ladder and unix-ms recovery as SQL text from the
extractor's constants (regexes, epochs, Crockford alphabet — none
contain a backslash, so the literals are escape-safe in both
parsers). Spark consumes it through ``F.expr`` (map-only
whole-stage codegen); the DuckDB twin consumes the other dialect.
The only dialect differences are hex→int (``conv`` vs ``'0x'``
cast), regex match (``rlike`` vs ``regexp_matches``), integer
division (``div`` vs ``//``) and shift (``shiftright`` vs ``>>``) —
every division/shift runs on non-negatives only (the cross-engine
truncate-vs-floor rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..extractor.idtimex import (CROCKFORD, GREGORIAN_OFFSET_100NS,
                                 INT_RE, SNOWFLAKE_EPOCH_MS,
                                 SNOWFLAKE_MAX_MS, SNOWFLAKE_MIN_MS,
                                 ULID_RE, UUID_RE)


def id_time_exprs(e: str, dialect: str = "spark") -> dict[str, str]:
    """SQL expressions {kind, ts_ms} over id expression ``e``."""
    if dialect == "spark":
        def hexl(g: str) -> str:
            return f"cast(conv({g}, 16, 10) as bigint)"

        def match(re_: str) -> str:
            return f"({e} rlike '{re_}')"
        div, shr = "div", "shiftright(%s, 22)"
    else:
        def hexl(g: str) -> str:
            return f"try_cast('0x' || lower({g}) AS bigint)"

        def match(re_: str) -> str:
            return f"regexp_matches({e}, '{re_}')"
        div, shr = "//", "(%s >> 22)"

    def grp(i: int) -> str:
        return f"regexp_extract({e}, '{UUID_RE}', {i})"

    ver = f"lower(substr({e}, 15, 1))"
    ticks = (f"(({hexl(grp(3))} % 4096) * {1 << 48} "
             f"+ {hexl(grp(2))} * {1 << 32} + {hexl(grp(1))})")
    uuid1_ms = (f"CASE WHEN {ticks} >= {GREGORIAN_OFFSET_100NS} "
                f"THEN ({ticks} - {GREGORIAN_OFFSET_100NS}) "
                f"{div} 10000 END")
    uuid7_ms = hexl(f"{grp(1)} || {grp(2)}")
    ulid_ms = f"cast(instr('{CROCKFORD}', substr({e}, 1, 1)) - 1" \
              f" as bigint)"
    for i in range(2, 11):
        ulid_ms = (f"({ulid_ms} * 32 + instr('{CROCKFORD}', "
                   f"substr({e}, {i}, 1)) - 1)")
    sf_ms = (f"({shr % f'try_cast({e} AS bigint)'} "
             f"+ {SNOWFLAKE_EPOCH_MS})")
    sf_ok = (f"{sf_ms} >= {SNOWFLAKE_MIN_MS} "
             f"AND {sf_ms} < {SNOWFLAKE_MAX_MS}")
    kind = f"""CASE
        WHEN {match(UUID_RE)} THEN
          CASE {ver} WHEN '1' THEN 'uuid1' WHEN '7' THEN 'uuid7'
               WHEN '4' THEN 'uuid4' ELSE 'uuid' END
        WHEN {match(ULID_RE)} THEN 'ulid'
        WHEN {match(INT_RE)} THEN
          CASE WHEN {sf_ok} THEN 'snowflake' ELSE 'int' END
        WHEN {e} IS NULL THEN NULL
        ELSE 'unknown' END"""
    ts_ms = f"""CASE
        WHEN {match(UUID_RE)} THEN
          CASE {ver} WHEN '1' THEN {uuid1_ms}
               WHEN '7' THEN {uuid7_ms} END
        WHEN {match(ULID_RE)} THEN {ulid_ms}
        WHEN {match(INT_RE)} THEN
          CASE WHEN {sf_ok} THEN {sf_ms} END
        END"""
    return {"kind": kind, "ts_ms": ts_ms}


def classify_ids(df: DataFrame, id_col: str = "id") -> DataFrame:
    ex = id_time_exprs(id_col, "spark")
    return df.withColumns({"kind": F.expr(ex["kind"]),
                           "ts_ms": F.expr(ex["ts_ms"])})
