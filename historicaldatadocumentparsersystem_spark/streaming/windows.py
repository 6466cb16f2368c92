"""Event-time windowed aggregation with watermarks (late-data handling).

The reference is pure batch, but the north-rule environment (a
continuously crawled Common-Crawl-style feed) needs the streaming
counting form: documents arrive with ``warc_ts`` event time, possibly
late; we aggregate per tumbling window and host, dropping data later
than the watermark. State is bounded by (watermark horizon x hosts),
not stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_doc_counts(docs: DataFrame, window_len: str = "10 minutes",
                        watermark: str = "30 minutes") -> DataFrame:
    """Streaming (or batch — same code) per-host, per-window counts.

    docs: (url, warc_ts, html, text, lang) with event-time warc_ts.
    Output: (window_start, window_end, host, n_docs, bytes_in).
    """
    return (docs
            .withWatermark("warc_ts", watermark)
            .withColumn("host", F.parse_url("url", F.lit("HOST")))
            .groupBy(F.window("warc_ts", window_len).alias("w"), "host")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.coalesce(F.length("html"), F.lit(0)))
                 .alias("bytes_in"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "host", "n_docs", "bytes_in"))
