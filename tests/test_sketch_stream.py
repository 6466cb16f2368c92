"""Incremental sketch maintenance: streamed per-batch sketches merge
to exactly the whole-corpus batch sketch, and replays converge."""

from pyspark.sql import functions as F

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.operators import sketches
from historicaldatadocumentparsersystem_spark.operators.textstats import tokens
from historicaldatadocumentparsersystem_spark.streaming.stream import (
    read_cms, read_hll, run_sketch_stream_once)


def _batch_sketches(docs):
    terms = docs.select(F.explode(F.transform(
        tokens("text"), lambda t: F.lower(t))).alias("term"))
    cms = {(r["row"], r["cell"]): r["cnt"]
           for r in sketches.cms_table(terms, "term").collect()}
    hll = {r["bucket"]: r["max_rho"]
           for r in sketches.hll_registers(docs, "url").collect()}
    return cms, hll


def test_streamed_sketches_match_batch_and_replay_converges(
        spark, tmp_path):
    src = str(tmp_path / "src")
    docs = fixtures.corpus_df(spark, 120, num_partitions=4)
    docs.write.parquet(src)
    out = str(tmp_path / "out")
    run_sketch_stream_once(spark, src, out)

    want_cms, want_hll = _batch_sketches(docs)
    got_cms = {(r["row"], r["cell"]): r["cnt"]
               for r in read_cms(spark, out).collect()}
    got_hll = {r["bucket"]: r["max_rho"]
               for r in read_hll(spark, out).collect()}
    assert got_cms == want_cms        # sum-merge over batches is exact
    assert got_hll == want_hll        # max-merge over batches is exact

    # estimates through the streamed tables equal the batch ones
    est_s = sketches.hll_estimate(read_hll(spark, out)).first()
    est_b = sketches.hll_distinct(docs, "url").first()
    assert est_s["estimate"] == est_b["estimate"]

    # full replay (checkpoint wiped, same batch ids) must converge,
    # not double-count the non-idempotent CMS sum
    import shutil
    shutil.rmtree(f"{out}/_checkpoint")
    run_sketch_stream_once(spark, src, out)
    again = {(r["row"], r["cell"]): r["cnt"]
             for r in read_cms(spark, out).collect()}
    assert again == want_cms
