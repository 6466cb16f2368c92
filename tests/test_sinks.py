"""Handoff sinks: JSONL shard export round-trip + dataset card."""

import json

from pyspark.sql import functions as F

from historicaldatadocumentparsersystem_spark import sinks


def _docs(spark, n=37):
    return spark.createDataFrame(
        [(i, f"doc {i} " + "w " * (i % 7), ["en", "de", "en", "fr"][i % 4])
         for i in range(n)],
        "doc_id long, text string, lang string")


def test_jsonl_shards_roundtrip_and_manifest(spark, tmp_path):
    df = _docs(spark)
    out = str(tmp_path / "export")
    manifest = sinks.write_jsonl_shards(df, out, docs_per_shard=10)
    assert manifest["n_rows"] == 37 and manifest["n_shards"] == 4
    assert sum(manifest["shards"].values()) == 37
    on_disk = json.load(open(f"{out}/manifest.json"))
    assert on_disk == manifest

    back = sinks.read_jsonl_shards(spark, out)
    got = {(r["doc_id"], r["text"], r["lang"]) for r in back.collect()}
    exp = {(r["doc_id"], r["text"], r["lang"]) for r in df.collect()}
    assert got == exp
    # per-shard dirs match the manifest counts
    per = {r["shard"]: r["n"] for r in
           back.groupBy("shard").agg(F.count("*").alias("n")).collect()}
    assert {str(k): v for k, v in per.items()} == manifest["shards"]
    # shard membership is a pure function of the id (re-export over a
    # differently-partitioned input is byte-stable shard-wise)
    again = sinks.write_jsonl_shards(df.repartition(7), out,
                                     docs_per_shard=10)
    assert again["shards"] == manifest["shards"]


def test_dataset_card_numbers(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, "a b c", "en"), (1, "a b c", "en"),     # exact dup pair
         (2, "x y", "de"), (3, "z", None)],
        "doc_id long, text string, lang string")
    card = sinks.write_dataset_card(df, str(tmp_path))
    assert card["n_docs"] == 4 and card["n_tokens"] == 3 + 3 + 2 + 1
    assert card["exact_dup_bp"] == 1 * 10000 // 4
    assert card["languages"]["en"] == {
        "docs": 2, "tokens": 6, "doc_share_bp": 5000,
        "token_share_bp": 6 * 10000 // 9}
    assert card["languages"]["unknown"]["docs"] == 1
    assert json.load(open(tmp_path / "dataset_card.json")) == card


def test_jsonl_export_is_single_scan_and_skips_count(spark, tmp_path):
    """Round-4 scale contract: with n_rows passed (lineage totals),
    the export reads the input corpus EXACTLY once — no sizing count,
    no second manifest pass. Witnessed by an accumulator that every
    scan of the input increments by one per row."""
    import pandas as pd

    acc = spark.sparkContext.accumulator(0)

    def counted(batches):
        for b in batches:
            acc.add(len(b))
            yield b

    df = _docs(spark, 37).mapInPandas(
        counted, "doc_id long, text string, lang string")
    manifest = sinks.write_jsonl_shards(
        df, str(tmp_path / "x"), docs_per_shard=10, n_rows=37)
    assert manifest["n_rows"] == 37 and manifest["n_shards"] == 4
    assert acc.value == 37  # one scan; a second pass would double it


def test_jsonl_shrinking_reexport_leaves_no_stale_shards(spark, tmp_path):
    """A re-export with fewer shards (fewer rows or larger
    docs_per_shard) must clear the previous export's extra shard dirs
    regardless of the session's partitionOverwriteMode."""
    out = str(tmp_path / "export")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        sinks.write_jsonl_shards(_docs(spark, 37), out, docs_per_shard=10)
        small = _docs(spark, 5)
        manifest = sinks.write_jsonl_shards(small, out, docs_per_shard=10)
        assert manifest["n_shards"] == 1 and manifest["n_rows"] == 5
        back = sinks.read_jsonl_shards(spark, out)
        assert back.count() == 5
        assert set(back.select("shard").distinct().toPandas()["shard"]) \
            == {0}
    finally:
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")


def test_jsonl_shard_files_are_byte_stable(spark, tmp_path):
    """Same rows, different input partitioning => identical shard
    FILE bytes (records id-ordered, keys sorted)."""
    import hashlib
    import os

    def hashes(out):
        h = {}
        for root, _, files in os.walk(out + "/data"):
            for f in files:
                p = os.path.join(root, f)
                h[os.path.relpath(p, out)] = hashlib.md5(
                    open(p, "rb").read()).hexdigest()
        return h

    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    sinks.write_jsonl_shards(_docs(spark, 37), out1, docs_per_shard=10)
    sinks.write_jsonl_shards(_docs(spark, 37).repartition(7), out2,
                             docs_per_shard=10)
    assert hashes(out1) == hashes(out2)


def test_wet_shrinking_reexport_leaves_no_stale_shards(spark, tmp_path):
    from datetime import datetime, timezone
    from historicaldatadocumentparsersystem_spark.sources import (
        read_wet_documents)
    import os

    def docs(n):
        return spark.createDataFrame(
            [(f"https://h.com/p{i}",
              datetime(2024, 7, 1, tzinfo=timezone.utc), f"t{i}")
             for i in range(n)],
            "url string, warc_ts timestamp, text string")

    out = str(tmp_path / "wet")
    sinks.write_wet_shards(docs(23), out, docs_per_shard=8)
    m = sinks.write_wet_shards(docs(5), out, docs_per_shard=8)
    assert m["n_shards"] == 1
    assert len(os.listdir(out + "/data")) == 1  # stale shards cleared
    assert read_wet_documents(spark, out + "/data/*").count() == 5


def test_wet_duplicate_urls_byte_stable(spark, tmp_path):
    """Two records sharing a url serialize in (url, ts, text) order —
    re-exports stay byte-stable even with duplicate urls."""
    from datetime import datetime, timezone
    import hashlib
    import os
    rows = [("https://h.com/same",
             datetime(2024, 7, 1, 0, 0, i % 3, tzinfo=timezone.utc),
             f"snapshot {i % 5}") for i in range(12)]
    docs = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string")
    out1, out2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    sinks.write_wet_shards(docs, out1, docs_per_shard=50,
                           gzip_records=False)
    sinks.write_wet_shards(docs.repartition(5), out2, docs_per_shard=50,
                           gzip_records=False)
    h = [hashlib.md5(open(os.path.join(o, "data", f), "rb").read())
         .hexdigest()
         for o in (out1, out2) for f in sorted(os.listdir(o + "/data"))]
    assert h[0] == h[1]


def test_wet_shards_roundtrip_through_wet_reader(spark, tmp_path):
    """Engine output exported as WET is byte-identically re-ingestable
    by the engine's own WET source (and so by any CC-WET consumer)."""
    from datetime import datetime, timezone
    from historicaldatadocumentparsersystem_spark.sources import (
        read_wet_documents)
    docs = spark.createDataFrame(
        [(f"https://h{i % 3}.com/p{i}",
          datetime(2024, 7, 1, 0, 0, i, tzinfo=timezone.utc),
          f"extracted text {i} with unicode é中" * (i % 4 + 1))
         for i in range(23)],
        "url string, warc_ts timestamp, text string")
    out = str(tmp_path / "wet")
    manifest = sinks.write_wet_shards(docs, out, docs_per_shard=8,
                                      gzip_records=True)
    assert manifest["n_rows"] == 23 and manifest["n_shards"] == 3
    assert sum(v["n_docs"] for v in manifest["shards"].values()) == 23
    back = read_wet_documents(spark, out + "/data/*")
    got = {(r["url"], r["text"]) for r in back.collect()}
    exp = {(r["url"], r["text"]) for r in docs.collect()}
    assert got == exp
    # re-export over a different partitioning is byte-stable per shard
    import hashlib
    import os
    h1 = {f: hashlib.md5(open(os.path.join(out, "data", f), "rb")
                         .read()).hexdigest()
          for f in sorted(os.listdir(out + "/data"))}
    sinks.write_wet_shards(docs.repartition(5), out, docs_per_shard=8,
                           gzip_records=True)
    h2 = {f: hashlib.md5(open(os.path.join(out, "data", f), "rb")
                         .read()).hexdigest()
          for f in sorted(os.listdir(out + "/data"))}
    assert h1 == h2
