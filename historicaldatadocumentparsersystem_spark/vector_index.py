"""Vector-store sink/source (S10): an IVF index laid out as parquet.

The reference pushes embeddings into pgvector and queries with
``ORDER BY l2_distance LIMIT k`` (``pg_vector_db.py:139-181``). The
Spark-first equivalent is an index AT REST in the lake:

- ``build_ivf_index`` assigns every vector to its nearest centroid and
  writes the corpus **partitioned by centroid id** (one inverted list
  per parquet partition) plus a tiny ``centroids`` side table.
- ``query_ivf_index`` picks each query's ``n_probe`` nearest centroids
  from the broadcast centroid table and reads ONLY those partitions —
  the ``cent_id IN (...)`` predicate is a partition filter, so at
  100 TB a probe touches n_probe/n_centroids of the files and the scan
  never materializes the rest (verified by the plan test:
  ``PartitionFilters`` on the parquet scan node).

Centroids here are the deterministic first-N-by-id rule shared with
``operators.similarity.ivf_topk`` (at scale: train k-means offline,
broadcast the trained table — same plan shape, better lists). Results
are identical to ``ivf_topk`` on the same parameters, which is the
equivalence test.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.similarity import _ranked_topk, cosine


def _centroids(df: DataFrame, n_centroids: int, id_col: str,
               vec_col: str) -> DataFrame:
    return (df.orderBy(id_col).limit(n_centroids)
            .select(F.col(id_col).alias("cent_id"),
                    F.col(vec_col).alias("cent_vec")))


def _nearest(df: DataFrame, cents: DataFrame, vec_col: str,
             part_cols: list[str], n: int) -> DataFrame:
    """Top-n centroids per row of ``df`` by cosine (broadcast join)."""
    w = Window.partitionBy(*part_cols).orderBy(
        F.desc("sim_c"), F.asc("cent_id"))
    return (df.crossJoin(F.broadcast(cents))
            .withColumn("sim_c", cosine(vec_col, F.col("cent_vec")))
            .withColumn("_rc", F.row_number().over(w))
            .where(F.col("_rc") <= n)
            .drop("_rc", "sim_c", "cent_vec"))


def build_ivf_index(df: DataFrame, path: str, n_centroids: int = 16,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> dict:
    """Write ``path/vectors`` partitioned by nearest-centroid id and
    ``path/centroids``. One broadcast assignment join + one
    partitionBy write — the corpus shuffles at most once."""
    cents = _centroids(df, n_centroids, id_col, vec_col)
    assigned = _nearest(df.select(id_col, vec_col), cents, vec_col,
                        [id_col], 1)
    (assigned.write.mode("overwrite").partitionBy("cent_id")
     .parquet(os.path.join(path, "vectors")))
    cents.write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    return {"n_vectors": assigned.count(), "n_centroids": n_centroids}


def query_ivf_index(spark: SparkSession, path: str, query_df: DataFrame,
                    k: int = 5, n_probe: int = 2,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Top-k per query against an on-disk IVF index, scanning only the
    probed inverted lists.

    The probed centroid-id set is collected to the driver — it is
    O(n_queries * n_probe) ints (queries are the small side by the same
    assumption that broadcasts them everywhere else) — and pushed into
    the scan as a partition filter.
    """
    cents = spark.read.parquet(os.path.join(path, "centroids"))
    probes = _nearest(query_df, cents, "embedding",
                      ["query_id"], n_probe) \
        .select("query_id", F.col("embedding").alias("qe"), "cent_id")
    probed_ids = [r["cent_id"] for r in
                  probes.select("cent_id").distinct().collect()]
    vectors = (spark.read.parquet(os.path.join(path, "vectors"))
               .where(F.col("cent_id").isin(probed_ids)))
    joined = (vectors.join(F.broadcast(probes), "cent_id")
              .where(F.col(id_col) != F.col("query_id"))
              .select("query_id", F.col(id_col).alias("neighbor_id"),
                      F.round(cosine(vec_col, "qe"), 6).alias("cos_sim")))
    return _ranked_topk(joined, k)
