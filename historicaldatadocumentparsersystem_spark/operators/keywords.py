"""Keyword-section selection + ordered reassembly (F4 + A2).

Reference semantics: a slide/section is kept iff its lowercased text
contains ANY keyword of a fixed set; kept sections are concatenated
with "\\n\\n" per document (``llm_support_kickoff_parser.py:60-79``,
``llm_rapport_final_parser.py:59-79``, ``llm_restitution_final_parser.py
:59-79``; A2 concat at ``:65-79``). Reassembly-with-separator per group
generalizes A1 (``base_parser.py:42``).

Spark form: rlike filter (codegen'd) -> groupBy -> ordered, deterministic
concat via sort_array(collect_list(struct(order_key, text))).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def keyword_filter(df: DataFrame, keywords: list[str],
                   text_col: str = "text") -> DataFrame:
    """Rows whose lowercased text contains any keyword (F4)."""
    pattern = "|".join(re.escape(k.lower()) for k in keywords)
    return df.where(F.lower(F.col(text_col)).rlike(pattern))


def ordered_concat(df: DataFrame, group_col: str, order_col: str,
                   text_col: str = "text", sep: str = "\n\n",
                   out_col: str = "joined") -> DataFrame:
    """Deterministic per-group concat in order_col order (A2).

    collect_list has no intrinsic order after a shuffle, so we collect
    (order, text) structs and sort_array them — order-stable on any
    cluster size (struct comparison is lexicographic: order first).
    """
    return (df.groupBy(group_col)
            .agg(F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(
                        F.struct(F.col(order_col).alias("o"),
                                 F.col(text_col).alias("t")))),
                    lambda s: s.getField("t")),
                sep).alias(out_col)))


def keyword_sections(df: DataFrame, keywords: list[str],
                     group_col: str, order_col: str,
                     text_col: str = "text") -> DataFrame:
    """F4 + A2 composed: filter sections, reassemble per document."""
    return ordered_concat(keyword_filter(df, keywords, text_col),
                          group_col, order_col, text_col)
