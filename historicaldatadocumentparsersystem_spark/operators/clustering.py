"""Embedding clustering: deterministic Lloyd k-means + SemDeDup.

The semantic layer of the training-data dedup suite (SemDeDup, Abbas
et al. 2023, arXiv:2303.09540): cluster the corpus embeddings with
k-means, then drop all but one member of every within-cluster
near-duplicate group. Complements the syntactic dedup family in
``operators/dedup.py`` and the pairwise ``embedding_near_dup_*`` ops
in ``operators/similarity.py`` — those find textual / pairwise-cosine
duplicates; this one scopes the quadratic cosine step to k-means
cells so it never goes all-pairs. Reference analog: the J3 retrieval
join's vector column (``pg_vector_db.py:139-181``) supplies the
embeddings; clustering itself is a pipeline extension mandated by the
LLM-data-ops scope, not a reference port.

Determinism (the oracle contract):

- init: centroids are the first ``k`` vectors in id order (cid = rank).
- assignment: squared-L2 fold in element order, seed 0.0 — identical
  to DuckDB ``list_reduce`` (0.0 + x is exact); argmin keeps the
  LOWEST cid on exact ties (strict ``<`` fold == row_number
  ``ORDER BY dist, cid``).
- recompute: per-dimension component sums ride as DECIMAL(20,9)
  (``round(v, 9)::decimal`` fixed-point — associative, merge-order
  free), and the mean is forced back through ``decimal(20,9)`` so
  both engines land on the identical 9-dp double before the next
  iteration's distance math.
- empty clusters keep their previous centroid.

Scale: canonical distributed Lloyd — the data NEVER moves. Each
iteration is (a) one narrow shuffle on (cluster, dim) for the
partial-aggregated component sums and (b) a k x dim driver collect
(KBs) re-broadcast as literals; assignment is a pure projection
inside whole-stage codegen (k folds of dim multiply-adds per row,
zero joins). The deliberate per-iteration driver action is the same
accepted pattern as ``dedup.connected_components`` — iterative
algorithms are the one place a tiny driver-side fixpoint is the
scalable design (Spark MLlib's KMeans does exactly this).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import _to_double, dot, norm


def _init_centroids(df: DataFrame, k: int, id_col: str,
                    vec_col: str) -> list[list[float]]:
    """First ``k`` vectors in id order — the deterministic seed both
    engines can reproduce (no RNG state to port)."""
    rows = (df.orderBy(id_col).limit(k)
            .select(_to_double(vec_col).alias("c")).collect())
    return [list(r["c"]) for r in rows]


def _best_cluster(cents: list[list[float]],
                  vec_col: str) -> tuple[Column, Column]:
    """(cid, squared_dist) of the nearest centroid: per-centroid
    squared L2 via the element-order fold; argmin = array_min + FIRST
    array_position, so exact-distance ties go to the lowest cid (the
    oracle's ``row_number() ORDER BY dist, cid`` rule).

    Each centroid rides as ONE array Literal (``F.lit(list)``), not an
    ``array(lit, lit, ...)`` tree of k x dim leaf nodes — same values,
    bit-identical fold (A/B-verified), but the plan stays compact as k
    grows (Catalyst re-analyzes these trees on every action)."""
    e = _to_double(vec_col)
    dists = F.array(*[
        F.aggregate(
            F.zip_with(e, F.lit([float(c) for c in v]),
                       lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x)
        for v in cents])
    best = F.array_min(dists)
    cid = (F.array_position(dists, best) - 1).cast("int")
    return cid, best


def kmeans_assign(df: DataFrame, k: int = 8, n_iter: int = 2,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding",
                  carry_vec: bool = False) -> DataFrame:
    """Lloyd k-means over an embedding column; returns one row per
    vector: (id_col, cluster, l2_dist) with l2_dist = round(sqrt of
    the squared distance to the final centroid, 6).

    ``n_iter`` is a FIXED iteration count (not convergence-tested) so
    the unrolled-CTE DuckDB oracle is finite; production callers pick
    n_iter high enough for their corpus and the result is still
    deterministic.

    ``carry_vec=True`` appends the raw ``vec_col`` to the output — the
    assignment is a pure projection, so carrying the vector is free
    and lets downstream consumers (``semantic_dedup``) skip an N-row
    join back to the source table.
    """
    cents = _init_centroids(df, k, id_col, vec_col)
    kk = len(cents)
    for _ in range(n_iter):
        cid, _d = _best_cluster(cents, vec_col)
        staged = df.select(cid.alias("cluster"),
                           _to_double(vec_col).alias("__e"))
        means = (staged.select("cluster",
                               F.posexplode("__e").alias("pos", "v"))
                 .groupBy("cluster", "pos")
                 .agg(F.round(F.sum(F.round("v", 9).cast("decimal(20,9)"))
                              .cast("double") / F.count("*"), 9)
                      .cast("decimal(20,9)").cast("double").alias("m"))
                 .groupBy("cluster")
                 .agg(F.array_sort(F.collect_list(F.struct("pos", "m")))
                      .alias("pm"))
                 .select("cluster", F.col("pm.m").alias("c"))
                 .collect())
        new = {r["cluster"]: list(r["c"]) for r in means}
        cents = [new.get(i, cents[i]) for i in range(kk)]
    cid, dist = _best_cluster(cents, vec_col)
    cols = [F.col(id_col), cid.alias("cluster"),
            F.round(F.sqrt(dist), 6).alias("l2_dist")]
    if carry_vec:
        cols.append(F.col(vec_col))
    return df.select(*cols)


def semantic_dedup(df: DataFrame, k: int = 8, n_iter: int = 2,
                   threshold: float = 0.35, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """SemDeDup: k-means cells scope the cosine near-dup step — a
    vector is dropped when a LOWER-id member of its own cluster has
    rounded cosine >= ``threshold``. Returns (id_col, cluster, kept).

    Scale: the quadratic step is an EQUI-join on cluster id — at
    corpus scale k grows with N (SemDeDup uses ~sqrt(N) cells) so the
    per-cell candidate set stays bounded; a pathologically hot cell is
    the LSH sub-bucketing case (``embedding_near_dup_lsh``), not an
    excuse for an all-pairs join. The corpus shuffles once on cluster
    id; everything else is the kmeans pass.
    """
    # localCheckpoint the assignment: it is referenced THREE times
    # below (both sides of the cell self-join + the final kept join),
    # and its plan embeds the k x dim literal-centroid projection —
    # left lazy, Catalyst re-analyzes that huge literal tree per
    # reference and the executors recompute the k-fold distance math
    # 3x over the corpus (measured 37 s -> ~8 s at sf0.1).
    # carry_vec rides the vector THROUGH the assignment projection so
    # the checkpoint already holds (id, cluster, vec, norm) — the old
    # assign-join-df shuffle (run once per self-join side) is gone
    # entirely (measured ~7.0 -> ~6.0 s at sf0.1; at corpus scale it
    # removes a full N-row shuffle join). norms are per-ROW
    # quantities, computed once before the quadratic join (N folds)
    # instead of inside the pair predicate (N^2 x 2 folds); dot/
    # (na*nb) is the same expression tree as cosine() — bit-identical
    # doubles, the oracle contract.
    m = (kmeans_assign(df, k, n_iter, id_col, vec_col, carry_vec=True)
         .select(F.col(id_col), "cluster", F.col(vec_col))
         .withColumn("__norm", norm(vec_col))
         .localCheckpoint())
    a, b = m.alias("a"), m.alias("b")
    dups = (a.join(b, (F.col("a.cluster") == F.col("b.cluster"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .where(F.round(dot(F.col(f"a.{vec_col}"),
                               F.col(f"b.{vec_col}"))
                           / (F.col("a.__norm") * F.col("b.__norm")), 6)
                   >= threshold)
            .select(F.col(f"b.{id_col}").alias(id_col)).distinct()
            .withColumn("__dup", F.lit(True)))
    return (m.select(F.col(id_col), "cluster")
            .join(dups, id_col, "left")
            .select(F.col(id_col), "cluster",
                    F.col("__dup").isNull().alias("kept")))
