"""Structured-record emission: text -> typed records, rule-based.

The reference's final stage routes reassembled text through an LLM and
parses JSON records ``{mission_name, entity, thematiques, data_type,
content}`` (``base_parser.py:52-90``, README.md:39-49), with one
keyword-driven selector per parser type
(``llm_support_kickoff_parser.py:60-79`` et al.). Byte-identical
verification forces the deterministic path (SURVEY.md §7.0): the LLM is
replaced by the same keyword-section machinery the reference itself
uses to PRE-select content — one rule per data_type, blocks matching
the rule concatenated in reading order, F7 defaulting for absent
fields. Docs with no matching block emit no record (F5: empty result,
not failure).

Fully JVM-side: rules are a literal array of structs; matching is
``regexp_like`` inside a higher-order filter; ordering is the
sort_array(collect_list(struct)) pattern (A2).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extract_records(df: DataFrame, rules: dict[str, list[str]],
                    id_col: str = "doc_id", text_col: str = "text",
                    block_split: str = r"\. ",
                    sep: str = " ") -> DataFrame:
    """(id, text) rows -> (id, data_type, content, n_blocks) records.

    rules: data_type -> keyword list (any-match, case-insensitive —
    the reference's three keyword sets become three entries here).
    Blocks = text split on ``block_split``; a block joins every
    data_type whose pattern it matches; per (id, data_type) the matched
    blocks concatenate in reading order with ``sep``.
    """
    rules_arr = F.array(*[
        F.struct(F.lit(dt).alias("data_type"),
                 F.lit("|".join(re.escape(k.lower()) for k in kws))
                 .alias("pat"))
        for dt, kws in rules.items()])
    blocks = (df.select(F.col(id_col).alias("id"),
                        F.posexplode(F.split(text_col, block_split))
                        .alias("ord", "block"))
              .where(F.trim("block") != ""))
    matched = (blocks
               .withColumn("hits", F.filter(
                   rules_arr,
                   lambda r: F.regexp_like(F.lower("block"),
                                           r.getField("pat"))))
               .where(F.size("hits") > 0)
               .select("id", "ord", "block",
                       F.explode("hits").alias("hit"))
               .select("id", "ord", "block",
                       F.col("hit.data_type").alias("data_type")))
    return (matched.groupBy("id", "data_type")
            .agg(F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(
                        F.struct(F.col("ord").alias("o"),
                                 F.col("block").alias("t")))),
                    lambda s: s.getField("t")),
                sep).alias("content"),
                F.count("*").alias("n_blocks"))
            .withColumn("content",
                        F.coalesce("content", F.lit("Not specified"))))
