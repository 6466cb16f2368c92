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


def overlapping_bbox_pairs(df: DataFrame, cell: float = 50.0) -> DataFrame:
    """Range (overlap) join without a cartesian: grid-cell binning.

    Each box is exploded onto the grid cells it covers; candidate pairs
    come from an equi-join on (url, page, cell) — only boxes sharing a
    cell ever meet — then the exact overlap predicate filters and
    dropDuplicates removes multi-cell repeats. At 10^12 rows the
    equi-join shuffles on uniform cell keys instead of degenerating
    into a BroadcastNestedLoop theta-join; ``cell`` trades shuffle
    width against candidate count.

    Overlap = strict interior intersection: max(x0) < min(x1) and
    max(y0) < min(y1). Output (url, page, kind_a, kind_b) pairs with
    kind_a < kind_b ordering by (x0, y0, kind) row identity.
    """
    boxed = df.withColumn(
        "_id", F.xxhash64("url", "page", "x0", "y0", "x1", "y1", "kind"))
    cells = boxed.withColumn(
        "cx", F.explode(F.sequence(F.floor(F.col("x0") / cell),
                                   F.floor(F.col("x1") / cell)))) \
        .withColumn(
        "cy", F.explode(F.sequence(F.floor(F.col("y0") / cell),
                                   F.floor(F.col("y1") / cell))))
    a, b = cells.alias("a"), cells.alias("b")
    # canonical pair order by row VALUES (struct comparison), matching a
    # SQL row-value tuple comparison, so oracles order pairs identically
    ord_a = F.struct(*[F.col(f"a.{c}") for c in
                       ("x0", "y0", "x1", "y1", "kind")])
    ord_b = F.struct(*[F.col(f"b.{c}") for c in
                       ("x0", "y0", "x1", "y1", "kind")])
    pairs = (a.join(b, (F.col("a.url") == F.col("b.url"))
                    & (F.col("a.page") == F.col("b.page"))
                    & (F.col("a.cx") == F.col("b.cx"))
                    & (F.col("a.cy") == F.col("b.cy"))
                    & (ord_a < ord_b))
             .where((F.greatest("a.x0", "b.x0") < F.least("a.x1", "b.x1"))
                    & (F.greatest("a.y0", "b.y0")
                       < F.least("a.y1", "b.y1")))
             .select(F.col("a.url").alias("url"),
                     F.col("a.page").alias("page"),
                     F.col("a._id").alias("id_a"),
                     F.col("b._id").alias("id_b"),
                     F.col("a.kind").alias("kind_a"),
                     F.col("b.kind").alias("kind_b"))
             .dropDuplicates(["id_a", "id_b"]))
    return pairs.select("url", "page", "kind_a", "kind_b")


def naive_overlapping_bbox_pairs(df: DataFrame) -> DataFrame:
    """Theta-join reference implementation (test oracle for the binned
    version; never run this at scale)."""
    boxed = df.withColumn(
        "_id", F.xxhash64("url", "page", "x0", "y0", "x1", "y1", "kind"))
    a, b = boxed.alias("a"), boxed.alias("b")
    ord_a = F.struct(*[F.col(f"a.{c}") for c in
                       ("x0", "y0", "x1", "y1", "kind")])
    ord_b = F.struct(*[F.col(f"b.{c}") for c in
                       ("x0", "y0", "x1", "y1", "kind")])
    return (a.join(b, (F.col("a.url") == F.col("b.url"))
                   & (F.col("a.page") == F.col("b.page"))
                   & (ord_a < ord_b)
                   & (F.greatest("a.x0", "b.x0") < F.least("a.x1", "b.x1"))
                   & (F.greatest("a.y0", "b.y0") < F.least("a.y1", "b.y1")))
            .select(F.col("a.url").alias("url"),
                    F.col("a.page").alias("page"),
                    F.col("a.kind").alias("kind_a"),
                    F.col("b.kind").alias("kind_b")))


def merge_spans(df: DataFrame, group_cols: list[str],
                start_col: str = "start", end_col: str = "end") -> DataFrame:
    """Span-merge provenance: (min(start), max(end), total chars)."""
    return (df.groupBy(*group_cols)
            .agg(F.min(start_col).alias("span_start"),
                 F.max(end_col).alias("span_end"),
                 F.sum(F.col(end_col) - F.col(start_col))
                 .alias("covered_chars")))
