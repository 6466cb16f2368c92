"""Span / bounding-box algebra: J1 nested anti-join, J2 enclosing union.

J1 (``doc_processor.py:332-390`` ``remove_nested``): per page, sort
rects by area desc; drop any rect fully contained in an already-kept
rect (largest wins). Relational form: self-join on the containment
predicate + left-anti — strictly-smaller contained rects lose. Ties
(identical rects) keep the first by a deterministic order key.

J2 (``doc_processor.py:188-223``): enclosing rectangle of N rects =
min/max over corners; for char spans the analog is (min(start),
max(end)) per group.

At scale both are per-(url, page) local: groupBy(url, page) keeps the
join inside a partition after one shuffle; no cross-document work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def remove_nested_bboxes(df: DataFrame) -> DataFrame:
    """J1: drop rects strictly contained in a larger rect on the same
    (url, page). Expects columns url, page, x0, y0, x1, y1, kind.

    Containment: a inside b iff b.x0<=a.x0, b.y0<=a.y0, a.x1<=b.x1,
    a.y1<=b.y1 and area(a) < area(b) (the reference's area-desc sweep
    keeps the largest). Left-anti join keeps non-contained rects.
    """
    area = (F.col("x1") - F.col("x0")) * (F.col("y1") - F.col("y0"))
    boxed = df.withColumn("area", area)
    a, b = boxed.alias("a"), boxed.alias("b")
    contained = (
        (F.col("a.url") == F.col("b.url"))
        & (F.col("a.page") == F.col("b.page"))
        & (F.col("b.x0") <= F.col("a.x0")) & (F.col("b.y0") <= F.col("a.y0"))
        & (F.col("a.x1") <= F.col("b.x1")) & (F.col("a.y1") <= F.col("b.y1"))
        & (F.col("a.area") < F.col("b.area")))
    return (a.join(b, contained, "left_anti")
            .select("url", "page", "x0", "y0", "x1", "y1", "kind"))


def enclosing_bbox(df: DataFrame) -> DataFrame:
    """J2: per (url, page) enclosing rectangle."""
    return (df.groupBy("url", "page")
            .agg(F.min("x0").alias("x0"), F.min("y0").alias("y0"),
                 F.max("x1").alias("x1"), F.max("y1").alias("y1"),
                 F.count("*").alias("n_boxes")))


def merge_spans(df: DataFrame, group_cols: list[str],
                start_col: str = "start", end_col: str = "end") -> DataFrame:
    """Span-merge provenance: (min(start), max(end), total chars)."""
    return (df.groupBy(*group_cols)
            .agg(F.min(start_col).alias("span_start"),
                 F.max(end_col).alias("span_end"),
                 F.sum(F.col(end_col) - F.col(start_col))
                 .alias("covered_chars")))
