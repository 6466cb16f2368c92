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
