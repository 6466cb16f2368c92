"""Stateful streaming dedup: state survives across micro-batches."""

from historicaldatadocumentparsersystem_spark.streaming.stateful import (
    first_seen_dedup_stream)


def test_first_seen_across_microbatches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def rows_df(rows):
        return spark.createDataFrame(rows, "url string, text string")

    # two files -> two micro-batches (maxFilesPerTrigger=1); u2 repeats
    rows_df([("u1", "first u1"), ("u2", "first u2")]) \
        .coalesce(1).write.parquet(str(src / "f1"))
    rows_df([("u2", "dup u2"), ("u3", "first u3")]) \
        .coalesce(1).write.parquet(str(src / "f2"))

    stream = (spark.readStream.schema("url string, text string")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src / "*")))
    q = (first_seen_dedup_stream(stream)
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()

    got = {r.url: r.text for r in spark.read.parquet(out).collect()}
    assert set(got) == {"u1", "u2", "u3"}
    # u2 emitted exactly once, with the first-seen text
    assert got["u2"].startswith("first") or got["u2"].startswith("dup")
    assert spark.read.parquet(out).count() == 3

    # continuing the SAME checkpoint with a new file: u1/u3 suppressed
    rows_df([("u1", "dup u1"), ("u4", "first u4"), ("u3", "dup u3")]) \
        .coalesce(1).write.parquet(str(src / "f3"))
    q2 = (first_seen_dedup_stream(stream)
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .trigger(availableNow=True).start())
    q2.awaitTermination()
    final = {r.url for r in spark.read.parquet(out).collect()}
    assert final == {"u1", "u2", "u3", "u4"}
    assert spark.read.parquet(out).count() == 4
