"""Distributed content-license detection — JVM built-ins only (no
Python in the hot path), sharing every regex/constant with
``extractor/licensex.py`` and the generated DuckDB twin.

Scale notes: ``license_signals`` is a union of three codegen'd
filter+project passes over the links and texts scans (no shuffle —
the union is narrow); ``license_resolve`` adds exactly ONE url
exchange (window rank). At 100 TB both ride the column-pruned scans
of the link table and the extracted-text table; the phrase channel
is a contains() chain, not a regex, so it stays in codegen.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..extractor import licensex


def license_signals(links: DataFrame, texts: DataFrame,
                    url_col: str = "url", href_col: str = "href",
                    text_col: str = "text") -> DataFrame:
    """(url, href) link rows + (url, text) page rows -> one row per
    license signal (url, source, license_id) across the three
    channels (link / spdx / phrase)."""
    g1 = F.regexp_extract(F.col(href_col), licensex.CC_HREF_RE, 1)
    g2 = F.regexp_extract(F.col(href_col), licensex.CC_HREF_RE, 2)
    cc = F.concat(F.lit("CC-"), F.upper(g1), F.lit("-"), g2)
    link_id = (F.when(g1 != "", cc)
               .when(F.col(href_col).rlike(licensex.CC0_HREF_RE),
                     "CC0-1.0"))
    from_links = (links
                  .select(F.col(url_col).alias("url"),
                          F.lit("link").alias("source"),
                          link_id.alias("license_id"))
                  .where(F.col("license_id").isNotNull()))
    spdx = F.regexp_extract(F.col(text_col), licensex.SPDX_RE, 1)
    from_spdx = (texts
                 .select(F.col(url_col).alias("url"),
                         F.lit("spdx").alias("source"),
                         spdx.alias("license_id"))
                 .where(F.col("license_id") != ""))
    low = F.lower(F.col(text_col))
    phrase_parts = [
        texts.select(F.col(url_col).alias("url"),
                     F.lit("phrase").alias("source"),
                     F.lit(lic).alias("license_id"))
        .where(low.contains(needle))
        for needle, lic in licensex.PHRASES]
    return reduce(DataFrame.unionByName,
                  [from_links, from_spdx] + phrase_parts)


def license_resolve(signals: DataFrame) -> DataFrame:
    """Signal rows -> one (url, license_id, source) per page by
    channel precedence (link > spdx > phrase), lexicographic id as
    the tiebreak. ONE url exchange."""
    rank = (F.when(F.col("source") == "link", 0)
            .when(F.col("source") == "spdx", 1)
            .otherwise(2))
    w = (Window.partitionBy("url")
         .orderBy(rank, F.col("license_id"), F.col("source")))
    return (signals
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("url", "license_id", "source"))
