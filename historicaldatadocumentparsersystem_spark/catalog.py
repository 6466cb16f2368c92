"""Iceberg-style table emulation: partitioned parquet + manifest + lineage.

No Iceberg runtime jar ships in this environment (SURVEY.md §7.0), so
the catalog isolates the table layout behind a tiny API that a real
Iceberg catalog can replace 1:1:

- ``extracted/`` : parquet partitioned by ``part_id`` with dynamic
  partition overwrite -> re-processing a bucket atomically replaces it
  (MERGE-on-processed-partitions semantics).
- ``lineage/``   : append-only parquet of per-partition metrics rows
  (FIXTURES.md §3). ``done_partitions`` is the resume checkpoint read.
- ``manifest.json`` : snapshot bookkeeping (ids passed in by the caller,
  never generated from the clock — determinism rule).

Reference analog: the Postgres ``document_list`` registry
(``pg_vector_db.py:364-409``) + status enum ``utils/document.py:29-35``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Catalog:
    def __init__(self, root: str) -> None:
        self.root = root
        self.extracted_path = os.path.join(root, "extracted")
        self.lineage_path = os.path.join(root, "lineage")
        self.manifest_path = os.path.join(root, "manifest.json")
        os.makedirs(root, exist_ok=True)

    # -- extracted table ----------------------------------------------------
    def write_extracted(self, df: DataFrame) -> None:
        """Write partitioned by part_id; dynamic overwrite = idempotent.

        No post-write count: row totals come from the lineage rows
        (``snapshot_output_rows``) — an incremental run must never pay
        a full-table scan just for bookkeeping.
        """
        spark = df.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        df.write.mode("overwrite").partitionBy("part_id") \
            .parquet(self.extracted_path)

    def read_extracted(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.extracted_path)

    def read_extracted_parts(self, spark: SparkSession,
                             parts: list[int]) -> DataFrame:
        """Partition-pruned read of specific buckets: ``part_id IN``
        lands as a PartitionFilter on the parquet scan (pinned by
        tests/test_plans.py), so an incremental lineage pass touches
        only this run's buckets — never the whole 100 TB table."""
        return (self.read_extracted(spark)
                .where(F.col("part_id").isin(list(parts))))

    # -- lineage table ------------------------------------------------------
    def append_lineage(self, df: DataFrame) -> None:
        df.write.mode("append").parquet(self.lineage_path)

    def read_lineage(self, spark: SparkSession) -> DataFrame | None:
        if not os.path.isdir(self.lineage_path):
            return None
        try:
            return spark.read.parquet(self.lineage_path)
        except Exception:
            return None

    def done_partitions(self, spark: SparkSession,
                        snapshot_id: str) -> set[int]:
        """Buckets already ContentExtracted for this snapshot (resume)."""
        lin = self.read_lineage(spark)
        if lin is None:
            return set()
        rows = (lin.where((lin.snapshot_id == snapshot_id)
                          & (lin.status == "ContentExtracted"))
                .select("partition_id").distinct().collect())
        return {r.partition_id for r in rows}

    def snapshot_output_rows(self, spark: SparkSession,
                             snapshot_id: str) -> int:
        """Total rows extracted for a snapshot, from LINEAGE — each
        bucket is written exactly once per snapshot (done buckets are
        skipped on resume), so a plain sum over its lineage rows equals
        the table count without scanning the table."""
        lin = self.read_lineage(spark)
        if lin is None:
            return 0
        total = (lin.where((lin.snapshot_id == snapshot_id)
                           & (lin.status == "ContentExtracted"))
                 .agg(F.sum("output_rows")).first()[0])
        return int(total or 0)

    # -- manifest -----------------------------------------------------------
    def commit_snapshot(self, snapshot_id: str, meta: dict) -> None:
        manifest = {"snapshots": {}}
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as fh:
                manifest = json.load(fh)
        manifest["snapshots"][snapshot_id] = meta
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=2, sort_keys=True)
        os.replace(tmp, self.manifest_path)  # atomic swap

    # -- maintenance ----------------------------------------------------------
    def data_files(self) -> list[str]:
        """Parquet data files of the extracted table (maintenance
        metric; excludes _SUCCESS/committed markers)."""
        out = []
        for root, _, names in os.walk(self.extracted_path):
            out += [os.path.join(root, n) for n in names
                    if n.endswith(".parquet")]
        return out

    def compact_extracted(self, spark: SparkSession,
                          target_rows_per_file: int = 1_000_000) -> dict:
        """Small-files compaction — the maintenance job every
        partitioned 100 TB table needs: each incremental/streaming
        write drops a few files per ``part_id``, and a year of runs
        turns every scan into an open()-bound crawl over millions of
        tiny files. This rewrites each partition into
        ceil(rows / target_rows_per_file) files, preserving rows,
        schema, and the part_id layout (resume/lineage untouched —
        compaction is physical, not logical).

        How: per-partition row counts come from ONE count aggregate
        over the partition column (parquet footer metadata — no data
        columns read), broadcast back as a files-per-partition plan;
        rows are salted deterministically (xxhash64(url) % n_files)
        and shuffled once on (part_id, salt) so each target file is
        written by exactly one task. Spark refuses to overwrite a
        path it is reading, so the rewrite stages into a sibling dir
        and swaps — the step a real Iceberg catalog does atomically
        by committing a new snapshot pointer (this emulation's swap
        is rmtree+rename; the manifest stays the source of truth).

        Returns {"files_before", "files_after", "rows"}.
        """
        import shutil

        before = len(self.data_files())
        df = self.read_extracted(spark)
        counts = (df.groupBy("part_id")
                  .agg(F.count("*").cast("long").alias("__rows")))
        plan = counts.select(
            "part_id", "__rows",
            F.greatest(
                F.expr(f"cast(ceil(__rows / {target_rows_per_file}"
                       f".0e0) AS int)"),
                F.lit(1)).alias("__n_files"))
        salted = (df.join(F.broadcast(plan), "part_id")
                  .withColumn("__salt",
                              F.pmod(F.xxhash64("url"),
                                     F.col("__n_files")).cast("int")))
        n_rows = int(plan.agg(F.sum("__rows")).first()[0] or 0)
        staged = self.extracted_path + ".compact-staging"
        shutil.rmtree(staged, ignore_errors=True)
        (salted.repartition("part_id", "__salt")
         .drop("__rows", "__n_files", "__salt")
         .write.mode("overwrite").partitionBy("part_id")
         .parquet(staged))
        # Swap non-destructively: move the live dir ASIDE first, then
        # promote staging, then drop the old copy — every crash point
        # leaves a recoverable directory (live, or .compact-old +
        # staging), unlike rmtree-then-rename which has a window where
        # the table path simply doesn't exist.
        old = self.extracted_path + ".compact-old"
        shutil.rmtree(old, ignore_errors=True)
        os.replace(self.extracted_path, old)
        os.replace(staged, self.extracted_path)
        shutil.rmtree(old)
        return {"files_before": before,
                "files_after": len(self.data_files()),
                "rows": n_rows}
