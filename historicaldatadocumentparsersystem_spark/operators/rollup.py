"""Hypertable-style cascading time rollups.

Multi-resolution time-series aggregates where each coarser level is
computed FROM the next finer level, never from raw rows — at 10^12
events the raw table is scanned once for the finest resolution and
every other level costs only |finer-level| rows. Correctness invariant:
the cascade equals the direct aggregation from raw (pinned by the
driver oracle, which computes the hourly level directly).

Only decomposable aggregates cascade (count, sum, min, max; avg as
sum/count) — the API exposes exactly those.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(df: DataFrame, ts_col: str, length: str) -> DataFrame:
    return df.withColumn("_w", F.window(ts_col, length))


def finest_rollup(events: DataFrame, ts_col: str = "ts",
                  key_col: str = "event_type",
                  value_col: str = "value",
                  length: str = "1 minute") -> DataFrame:
    """Raw rows -> finest level: (bucket_start, key, n, total, vmin, vmax).

    ``total`` stays UNROUNDED — rounding only at presentation, or the
    cascade would drift from the direct aggregate."""
    return (_bucket(events, ts_col, length)
            .groupBy(F.col("_w.start").alias("bucket_start"),
                     F.col(key_col).alias("key"))
            .agg(F.count("*").alias("n"),
                 F.sum(value_col).alias("total"),
                 F.min(value_col).alias("vmin"),
                 F.max(value_col).alias("vmax")))


def rollup_coarser(finer: DataFrame, length: str) -> DataFrame:
    """Finer level -> coarser level (decomposable merge, no raw scan)."""
    return (_bucket(finer, "bucket_start", length)
            .groupBy(F.col("_w.start").alias("bucket_start"), "key")
            .agg(F.sum("n").alias("n"),
                 F.sum("total").alias("total"),
                 F.min("vmin").alias("vmin"),
                 F.max("vmax").alias("vmax")))


def cascade(events: DataFrame, ts_col: str = "ts",
            key_col: str = "event_type", value_col: str = "value",
            lengths: tuple[str, ...] = ("1 minute", "1 hour", "1 day")
            ) -> list[DataFrame]:
    """Full cascade, finest first. levels[i+1] derives from levels[i]."""
    levels = [finest_rollup(events, ts_col, key_col, value_col,
                            lengths[0])]
    for length in lengths[1:]:
        levels.append(rollup_coarser(levels[-1], length))
    return levels
