#!/usr/bin/env python
"""spark-submit entry point for the flagship extraction job.

Cluster launch form (north rule):

    zip -r hddps_spark.zip historicaldatadocumentparsersystem_spark
    spark-submit --master <cluster> --py-files hddps_spark.zip \
        submit_extract.py --input <documents parquet/table dir> \
        --output <catalog dir> --run-id r1 --snapshot-id snap-1 \
        --num-buckets 4096

Resume: re-running with the same --output and --snapshot-id skips every
bucket whose lineage row is ContentExtracted (exact
MERGE-on-processed-partitions semantics, see catalog.py). run-id and
snapshot-id are caller-supplied — never derived from the clock.

Sizing at 10^12 docs: --num-buckets should put ~100-200 MB of html per
bucket post-shuffle (spark.sql.files.maxPartitionBytes-aligned);
spark.sql.execution.arrow.maxRecordsPerBatch stays modest (256-1024)
because pages are KB-to-MB blobs.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--snapshot-id", default="snap-0")
    ap.add_argument("--num-buckets", type=int, default=256)
    ap.add_argument("--synthetic-docs", type=int, default=0,
                    help="generate N synthetic docs instead of --input")
    ap.add_argument("--doc-scale", type=int, default=1)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from historicaldatadocumentparsersystem_spark import fixtures, pipeline, sources

    spark = (SparkSession.builder
             .appName(f"extract-{args.run_id}")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
             .getOrCreate())
    if args.synthetic_docs:
        docs = fixtures.corpus_df_distributed(
            spark, args.synthetic_docs,
            num_partitions=spark.sparkContext.defaultParallelism * 2,
            scale=args.doc_scale)
    else:
        docs = sources.read_documents(spark, args.input)
    stats = pipeline.run_extraction(
        spark, docs, args.output, run_id=args.run_id,
        snapshot_id=args.snapshot_id, num_buckets=args.num_buckets)
    print(json.dumps({"run_id": args.run_id, **stats}))
    spark.stop()


if __name__ == "__main__":
    main()
