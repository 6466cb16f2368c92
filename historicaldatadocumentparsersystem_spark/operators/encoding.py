"""Charset diagnostics + mojibake repair over the documents table.

Spark wrapper over the Spark-free ``extractor/charsetx.py`` (the
correctness oracle — golden-parquet parity is structural, the
extract_links pattern). Reference analog: the reference's loaders
inherit requests/bs4 charset guessing implicitly
(``web_page_system.py`` loader path); here the policy is explicit,
deterministic and per-document observable.

Scale: map-only 1->1 mapInPandas over (url, html) — no shuffle; the
100 TB cost is one pass over payload bytes, and the diagnostic
columns are ~100s of bytes per row. Downstream gates are codegen'd
filters over the profile columns (``moji_hits_after = 0``,
``n_replacements = 0``), so re-crawl / quarantine routing never
touches the payload again.
"""
from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (BooleanType, IntegerType, StringType,
                               StructField, StructType)

from ..extractor import charsetx

ENCODING_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("charset", StringType(), False),
    StructField("source", StringType(), False),
    StructField("declared", StringType(), True),
    StructField("declared_ok", BooleanType(), True),
    StructField("utf8_valid", BooleanType(), False),
    StructField("n_replacements", IntegerType(), False),
    StructField("mojibake_passes", IntegerType(), False),
    StructField("moji_hits_before", IntegerType(), False),
    StructField("moji_hits_after", IntegerType(), False),
    StructField("text", StringType(), False),
])

_COLS = [f.name for f in ENCODING_SCHEMA.fields]


def encoding_profile_df(docs: DataFrame) -> DataFrame:
    """documents (url, html, ...) -> one diagnostics row per non-empty
    payload: sniffed charset + signal source, declaration validity,
    strict-UTF-8 validity, replacement-char count, mojibake repair
    pass count and before/after detector hits, and the repaired text.
    Empty payloads yield no row (the extract_links contract);
    undecodable garbage degrades to a lossy-decode row, never fails
    the task (F5)."""
    import pandas as pd

    def batch(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for u, payload in zip(pdf["url"], pdf["html"]):
                if not payload:
                    continue
                prof = charsetx.encoding_profile(bytes(payload))
                rows.append((u, *(prof[c] for c in _COLS[1:])))
            yield pd.DataFrame(rows, columns=_COLS)

    return docs.select("url", "html").mapInPandas(batch, ENCODING_SCHEMA)
