"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k as the exactness baseline; LSH-bucketed
(random-hyperplane signs) variant as the 100 TB scale path. Reference
analog: the retrieval join J3 (``pg_vector_db.py:139-181``: ORDER BY
l2_distance LIMIT k with metadata pre-filter) and W2 top-k.

All arithmetic is JVM-side (``zip_with`` + ``aggregate`` over doubles,
no Python); results are rounded so a DuckDB oracle can reproduce the
values bit-stably.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _to_double(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    return F.aggregate(F.zip_with(_to_double(a), _to_double(b),
                                  lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a) -> Column:
    return F.sqrt(F.aggregate(_to_double(a), F.lit(0.0),
                              lambda acc, x: acc + x * x))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a, b) -> Column:
    """J3's ``l2_distance`` (pg_vector ``<->``) as a column expr."""
    return F.sqrt(F.aggregate(
        F.zip_with(_to_double(a), _to_double(b),
                   lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x))


def _ranked_topk(cands: DataFrame, k: int) -> DataFrame:
    """(query_id, neighbor_id, cos_sim) candidates -> top-k per query.

    Two-phase rank: a single ``Window.partitionBy(query_id)`` sorts ALL
    candidates with parallelism = |queries| (5 queries -> 5 tasks doing
    every comparison, whatever the cluster size). Phase 1 ranks per
    (query, source partition id): its exchange moves the same row
    volume but hashes on (query_id, pid), spreading the sort over
    partitions x queries tasks, and only k rows per (query, pid)
    survive. Phase 2 re-ranks the surviving ~(partitions x k) rows per
    query — a tiny exchange. Identical result: any row cut by phase 1
    loses the same deterministic (cos_sim DESC, neighbor_id ASC)
    comparison globally.
    """
    order = (F.desc("cos_sim"), F.asc("neighbor_id"))
    w_local = Window.partitionBy("query_id", "pid").orderBy(*order)
    survivors = (cands.withColumn("pid", F.spark_partition_id())
                 .withColumn("rk1", F.row_number().over(w_local))
                 .where(F.col("rk1") <= k).drop("pid", "rk1"))
    w = Window.partitionBy("query_id").orderBy(*order)
    return (survivors.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .select("query_id", "neighbor_id", "cos_sim", "rk"))


def brute_force_topk(df: DataFrame, query_df: DataFrame, k: int = 5,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors for every query vector.

    query_df: (query_id, embedding). The query side is BROADCAST — at
    100 TB the corpus side streams, queries are small dims. Ranking is
    the two-phase ``_ranked_topk`` (parallel rank, tiny final
    exchange).
    """
    joined = (df.alias("c")
              .join(F.broadcast(query_df.alias("q")),
                    F.col(f"c.{id_col}") != F.col("q.query_id"))
              .select(F.col("q.query_id").alias("query_id"),
                      F.col(f"c.{id_col}").alias("neighbor_id"),
                      F.round(cosine(F.col("c." + vec_col),
                                     F.col("q.embedding")), 6)
                      .alias("cos_sim")))
    return _ranked_topk(joined, k)


def hyperplane_signature(vec_col, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH signature: sign bits of dot(v, plane_i),
    packed into a long. Planes are deterministic (seeded by caller)."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        d = F.aggregate(
            F.zip_with(_to_double(vec_col),
                       F.array(*[F.lit(float(p)) for p in plane]),
                       lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x)
        sig = sig + F.when(d > 0, F.lit(2 ** i)).otherwise(F.lit(0))
    return sig.cast("long")


def _signatures_arrow(d: DataFrame, idc: str, vc: str,
                      tables: list[list[list[float]]]) -> DataFrame:
    """(id, vec as array<double>, t, sig) — one row per (input row,
    table), signatures computed batch-vectorized in numpy with the
    EXACT sequential dot fold of ``hyperplane_signature`` (same IEEE
    ops in the same order, so the sign bits — which flip only at
    dot == 0 — are bit-identical; pinned by
    test_lsh_signatures_arrow_matches_expression). Replaces the r5
    posexplode over 16 interpreted dim-wise folds per row (guide
    §4.2: HOFs never codegen — this was ~3 s of lsh_topk's 4.7 s at
    sf1.0). The vector rides as the cast double array (cast
    float->double is exact, and downstream cosine() folds over
    doubles either way)."""
    import numpy as np
    P = [np.array([[float(x) for x in pl] for pl in planes],
                  dtype=np.float64) for planes in tables]
    id_type = dict(d.dtypes)[idc]
    schema = f"{idc} {id_type}, {vc} array<double>, t int, sig long"

    def sign(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array([np.asarray(v, dtype=np.float64)
                          for v in pdf[vc]], dtype=np.float64)
            n = len(V)
            frames = []
            for t, planes in enumerate(P):
                sig = np.zeros(n, dtype=np.int64)
                for i in range(planes.shape[0]):
                    acc = np.zeros(n, dtype=np.float64)
                    for dd in range(planes.shape[1]):
                        acc += V[:, dd] * planes[i, dd]
                    sig += np.where(acc > 0, 1 << i, 0)
                frames.append(pd.DataFrame({
                    idc: pdf[idc].values,
                    vc: list(V),
                    "t": np.full(n, t, dtype="int32"),
                    "sig": sig}))
            yield pd.concat(frames, ignore_index=True)

    from .skew import spread_small_scan
    return spread_small_scan(d.select(idc, vc)).mapInPandas(sign, schema)


def make_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no numpy RNG state)."""
    import random
    rng = random.Random(f"planes:{seed}")
    return [[rng.uniform(-1.0, 1.0) for _ in range(dim)]
            for _ in range(n_planes)]


def ivf_topk(df: DataFrame, query_df: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_centroids: int = 16, n_probe: int = 2) -> DataFrame:
    """IVF-style ANN: partition the corpus into inverted lists by
    nearest centroid; a query scans only its ``n_probe`` closest lists.

    Centroids are the first ``n_centroids`` corpus vectors by id —
    deterministic (no k-means iterations; at 100 TB you'd train once
    offline and broadcast, which is exactly the plan shape here: the
    centroid table is broadcast to both assignment joins, the corpus is
    shuffled ONCE on centroid_id and can be written bucketed by it so
    later queries prune 14/16 of the data at the scan).
    """
    cents = (df.orderBy(id_col).limit(n_centroids)
             .select(F.col(id_col).alias("cent_id"),
                     F.col(vec_col).alias("cent_vec")))
    w_c = Window.partitionBy(id_col).orderBy(
        F.desc("sim_c"), F.asc("cent_id"))
    assigned = (df.crossJoin(F.broadcast(cents))
                .withColumn("sim_c", cosine(vec_col, F.col("cent_vec")))
                .withColumn("rc", F.row_number().over(w_c))
                .where(F.col("rc") == 1)
                .select(id_col, vec_col, "cent_id"))
    w_q = Window.partitionBy("query_id").orderBy(
        F.desc("sim_q"), F.asc("cent_id"))
    probes = (query_df.crossJoin(F.broadcast(cents))
              .withColumn("sim_q", cosine("embedding", F.col("cent_vec")))
              .withColumn("rq", F.row_number().over(w_q))
              .where(F.col("rq") <= n_probe)
              .select("query_id", F.col("embedding").alias("qe"),
                      "cent_id"))
    joined = (assigned.join(F.broadcast(probes), "cent_id")
              .where(F.col(id_col) != F.col("query_id"))
              .select("query_id", F.col(id_col).alias("neighbor_id"),
                      F.round(cosine(vec_col, "qe"), 6)
                      .alias("cos_sim")))
    return _ranked_topk(joined, k)


def embedding_near_dup_pairs(df: DataFrame, threshold: float = 0.5,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-dup pairs (training-data dedup op).

    All-pairs form for oracle checking; the scale path buckets by LSH
    signature first (``hyperplane_signature``) so the join is per
    bucket, never cartesian."""
    a, b = df.alias("a"), df.alias("b")
    return (a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    F.round(cosine(F.col(f"a.{vec_col}"),
                                   F.col(f"b.{vec_col}")), 6)
                    .alias("cos_sim"))
            .where(F.col("cos_sim") >= threshold))


def embedding_near_dup_lsh(df: DataFrame, threshold: float = 0.5,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding", dim: int = 64,
                           n_planes: int = 4, n_tables: int = 6,
                           seed: int = 42) -> DataFrame:
    """Embedding-cosine near-dup, LSH-bucketed — the 100 TB scale path
    (``embedding_near_dup_pairs`` is kept only as the exactness oracle
    for pytest; its O(n^2) self-join must never run at scale).

    Candidates come from an EQUI-join on (table, signature): the corpus
    is exploded to one row per (id, table, sig) and self-joined per
    bucket — never a cartesian. Duplicate candidates across tables are
    collapsed before the exact cosine. Signatures use the deterministic
    ``make_planes`` hyperplanes, so a SQL oracle reproduces them by
    embedding the plane constants as double literals.

    Expected recall for a pair with cosine s is
    1 - (1 - p**n_planes)**n_tables with p = 1 - acos(s)/pi — tune
    n_planes down / n_tables up for higher recall.

    At 100 TB: persist the exploded corpus bucketed by (t, sig) once;
    each bucket's self-join is then co-located (no shuffle) and skewed
    buckets are split by AQE. Vectors ride along into the candidate
    dedup (cheaper than two id->vector re-joins at dim 64; for very
    wide vectors, dedup on ids and re-join instead).
    """
    tables = [make_planes(dim, n_planes, seed + t) for t in range(n_tables)]
    sigs = _signatures_arrow(df, id_col, vec_col, tables)
    a, b = sigs.alias("a"), sigs.alias("b")
    cand = (a.join(b, (F.col("a.t") == F.col("b.t"))
                   & (F.col("a.sig") == F.col("b.sig"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    F.col(f"a.{vec_col}").alias("va"),
                    F.col(f"b.{vec_col}").alias("vb"))
            .dropDuplicates(["id_a", "id_b"]))
    return (cand.select("id_a", "id_b",
                        F.round(cosine("va", "vb"), 6).alias("cos_sim"))
            .where(F.col("cos_sim") >= threshold))


def lsh_topk(df: DataFrame, query_df: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int = 64, n_planes: int = 8, n_tables: int = 2,
             seed: int = 42) -> DataFrame:
    """Approximate top-k: candidates = corpus rows sharing an LSH bucket
    with the query in ANY of ``n_tables`` tables, then exact cosine rank
    within candidates.

    The scale path: the corpus is exploded ONCE to (id, t, sig) and the
    (tiny) query side — exploded the same way — is BROADCAST, so the
    candidate join is a BroadcastHashJoin keyed on (t, sig): every
    corpus row hashes into its probe buckets and rows outside any query
    bucket are dropped at the join, never scored. (An earlier form
    joined on an OR of per-table signature equalities — that compiles
    to BroadcastNestedLoopJoin, i.e. brute force with extra signature
    math; tests/test_plans.py pins the equi-join shape.) At 100 TB,
    persist the exploded corpus bucketed by (t, sig) and the probe read
    prunes at the scan.
    """
    tables = [make_planes(dim, n_planes, seed + t) for t in range(n_tables)]
    c = _signatures_arrow(df, id_col, vec_col, tables)
    q = (_signatures_arrow(query_df, "query_id", "embedding", tables)
         .withColumnRenamed("embedding", "__qv"))
    cand = (c.join(F.broadcast(q), ["t", "sig"])
            .where(F.col(id_col) != F.col("query_id"))
            # a (query, neighbor) pair matching in several tables is one
            # candidate — dedup BEFORE the exact cosine
            .dropDuplicates(["query_id", id_col]))
    joined = cand.select(
        "query_id", F.col(id_col).alias("neighbor_id"),
        F.round(cosine(vec_col, "__qv"), 6).alias("cos_sim"))
    return _ranked_topk(joined, k)


def quantize_embeddings(df: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Symmetric int8 quantization of an embedding column — the
    at-rest ANN compression step: (id, q array<int> in [-127, 127],
    s_micro long) where s_micro = floor(max|v| * 1e6) (>= 1) and
    q_i = floor(v_i * 127e6 / s_micro + 0.5). A quantized corpus is
    ~4x fewer scan bytes than float32 (8x vs float64), which at
    100 TB of vectors is the difference between an ANN sweep reading
    25 TB and reading 100 TB.

    Every step is floor/IEEE arithmetic in a fixed evaluation order,
    so the DuckDB twin reproduces the integers bit-exactly (no
    round() — engines disagree on tie semantics; floor(x + 0.5) is
    deterministic everywhere). Dequantization error is <= s/254 per
    coordinate.

    Scale: map-only projection — no shuffle, no UDF.
    """
    v = _to_double(vec_col)
    max_abs = F.aggregate(v, F.lit(0.0),
                          lambda acc, x: F.greatest(acc, F.abs(x)))
    staged = df.select(
        F.col(id_col), v.alias("__v"),
        F.greatest(F.floor(max_abs * F.lit(1000000.0)).cast("long"),
                   F.lit(1).cast("long")).alias("s_micro"))
    q = F.transform(
        F.col("__v"),
        lambda x: F.floor(x * F.lit(127000000.0)
                          / F.col("s_micro").cast("double")
                          + F.lit(0.5)).cast("int"))
    return staged.select(id_col, q.alias("q"), "s_micro")


def quantized_topk(df: DataFrame, query_df: DataFrame, k: int = 5,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Brute-force top-k over int8-quantized vectors, exact-cosine
    rerank of the winners: candidates rank by score_q = int_dot *
    s_micro(neighbor) — PURE int64 (the query's own scale is constant
    per query, so it cannot change the order), making the quantized
    ranking deterministic and bit-exact cross-engine; the float
    cosine is then computed only for the k survivors.

    Output: (query_id, neighbor_id, score_q, rk, cos_sim).

    Scale: the corpus streams once over its int8 arrays (4x fewer
    bytes than the float sweep of ``brute_force_topk``), the
    quantized query side broadcasts, and the exact rerank touches
    k rows per query — the standard quantize-then-rerank ANN shape.
    """
    qc = quantize_embeddings(df, id_col, vec_col)
    qq = (quantize_embeddings(query_df, "query_id", "embedding")
          .select("query_id", F.col("q").alias("qq")))
    int_dot = F.aggregate(
        F.zip_with("q", "qq", lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    cands = (qc.join(F.broadcast(qq),
                     F.col(id_col) != F.col("query_id"))
             .select("query_id", F.col(id_col).alias("neighbor_id"),
                     (int_dot * F.col("s_micro")).alias("score_q")))
    order = (F.desc("score_q"), F.asc("neighbor_id"))
    w_local = Window.partitionBy("query_id", "pid").orderBy(*order)
    survivors = (cands.withColumn("pid", F.spark_partition_id())
                 .withColumn("rk1", F.row_number().over(w_local))
                 .where(F.col("rk1") <= k).drop("pid", "rk1"))
    w = Window.partitionBy("query_id").orderBy(*order)
    winners = (survivors.withColumn("rk", F.row_number().over(w))
               .where(F.col("rk") <= k))
    # exact rerank column: float cosine for the k survivors only
    c = df.select(F.col(id_col).alias("neighbor_id"),
                  F.col(vec_col).alias("__cv"))
    qv = query_df.select("query_id", F.col("embedding").alias("__qv"))
    return (winners.join(c, "neighbor_id").join(F.broadcast(qv),
                                                "query_id")
            .select("query_id", "neighbor_id",
                    F.col("score_q").cast("long").alias("score_q"),
                    "rk", F.round(cosine("__cv", "__qv"), 6)
                    .alias("cos_sim")))
