"""Page-metadata operator: documents -> one metadata row per page.

Spark wrapper over the Spark-free ``extractor/metax.py`` (the
correctness oracle — golden-parquet parity is structural, same
pattern as extract_links). Reference analog: the engine's web loader
keeps document title/metadata alongside the extracted body.

Scale: map-only 1->1 mapInPandas over (url, html); the narrow select
keeps column pruning at the scan, output rows are ~100s of bytes, and
there is no shuffle — the 100 TB cost is exactly one pass over the
payload bytes. Downstream, ``canonical`` is the cheap pre-dedup key
(groupBy canonical before any content hashing) and ``robots``
noindex gating is a codegen'd filter.
"""
from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

from ..extractor import metax

META_SCHEMA = StructType(
    [StructField("url", StringType(), False)]
    + [StructField(f, StringType(), True) for f in metax.META_FIELDS])


def extract_meta_df(docs: DataFrame) -> DataFrame:
    """documents (url, html, ...) -> (url, title, description,
    keywords, robots, canonical, og_*, lang). Empty payloads yield no
    row (the extract_links contract); malformed pages degrade to null
    fields, never fail the task (F5)."""
    import pandas as pd

    def batch(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = ["url", *metax.META_FIELDS]
        for pdf in it:
            rows = []
            for u, payload in zip(pdf["url"], pdf["html"]):
                if not payload:
                    continue
                m = metax.extract_meta(payload, u)
                rows.append((u, *(m[f] for f in metax.META_FIELDS)))
            yield pd.DataFrame(rows, columns=cols)

    return docs.select("url", "html").mapInPandas(batch, META_SCHEMA)
