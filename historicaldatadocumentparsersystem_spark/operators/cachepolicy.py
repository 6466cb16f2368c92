"""Distributed recrawl-economics mining over response headers —
Arrow passes around ``extractor/cachex.py`` (RFC 9111 subset).

Scale notes: both ops are map-only 1->N / 1->1 mapInPandas passes —
no shuffle at all; the bucket rollup adds ONE groupBy on the bucket
key (tiny cardinality, map-side partial agg). At 100 TB the header
columns are a few hundred bytes per capture, so these ride the same
scan as any capture-view query; predicate pushdown keeps untouched
columns out of the Arrow transfer (select the header columns only).

Pure-Python twin: extractor/cachex.py; DuckDB twin: generated from
the same regex/formula constants in __spark_entry__.py.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..extractor import cachex

HEADER_COLS = ("cache_control", "hdr_age", "hdr_date", "hdr_expires",
               "hdr_last_modified", "hdr_etag")

_POLICY_SCHEMA = ("url string, no_store boolean, no_cache boolean, "
                  "private boolean, immutable boolean, "
                  "must_revalidate boolean, age_s bigint, "
                  "ttl_s bigint, ttl_source string, "
                  "fresh_for_s bigint, has_etag boolean, "
                  "etag_weak boolean, has_last_modified boolean")


def cache_directives(df: DataFrame, cc_col: str = "cache_control",
                     url_col: str = "url") -> DataFrame:
    """(url, Cache-Control value) -> one row per parsed directive
    (url, pos, directive, arg). Malformed items drop (F5)."""

    def run(batches: Iterator) -> Iterator:
        for b in batches:
            urls, poss, names, args = [], [], [], []
            for url, raw in zip(b[url_col], b[cc_col]):
                for pos, name, arg in cachex.parse_cache_control(raw):
                    urls.append(url)
                    poss.append(pos)
                    names.append(name)
                    args.append(arg)
            yield pd.DataFrame({
                "url": urls,
                "pos": pd.array(poss, dtype="int32"),
                "directive": names, "arg": args})

    return (df.select(url_col, cc_col)
            .mapInPandas(run, "url string, pos int, "
                              "directive string, arg string"))


def cache_policy_table(df: DataFrame,
                       url_col: str = "url") -> DataFrame:
    """Header columns (``HEADER_COLS``) -> one freshness-policy row
    per capture: flags, age, ttl + its source, fresh_for_s, and the
    validator surface (ETag / Last-Modified) a conditional-GET
    scheduler needs."""

    def run(batches: Iterator) -> Iterator:
        for b in batches:
            rows = []
            for t in zip(b[url_col], *(b[c] for c in HEADER_COLS)):
                url, hdrs = t[0], t[1:]
                p = cachex.cache_policy(*(None if v is None else v
                                          for v in hdrs))
                p["url"] = url
                rows.append(p)
            out = pd.DataFrame(rows, columns=[
                "url", "no_store", "no_cache", "private",
                "immutable", "must_revalidate", "age_s", "ttl_s",
                "ttl_source", "fresh_for_s", "has_etag",
                "etag_weak", "has_last_modified"])
            for c in ("age_s", "ttl_s", "fresh_for_s"):
                out[c] = pd.array(out[c], dtype="Int64")
            yield out

    return (df.select(url_col, *HEADER_COLS)
            .mapInPandas(run, _POLICY_SCHEMA))


def revisit_buckets(policy: DataFrame) -> DataFrame:
    """Policy rows -> scheduler buckets: revalidate-every-fetch
    (no-store/no-cache), unknown (no freshness basis), then
    hour/day/week/long by fresh_for_s. One tiny groupBy."""
    bucket = (F.when(F.col("no_store") | F.col("no_cache"),
                     "revalidate")
              .when(F.col("fresh_for_s").isNull(), "unknown")
              .when(F.col("fresh_for_s") < 3600, "hour")
              .when(F.col("fresh_for_s") < 86400, "day")
              .when(F.col("fresh_for_s") < 604800, "week")
              .otherwise("long"))
    return (policy.groupBy(bucket.alias("bucket"))
            .agg(F.count("*").cast("long").alias("n"),
                 F.sum(F.col("has_etag").cast("long"))
                 .alias("n_etag"),
                 F.sum(F.col("must_revalidate").cast("long"))
                 .alias("n_must_reval")))
