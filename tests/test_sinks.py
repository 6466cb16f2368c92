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
