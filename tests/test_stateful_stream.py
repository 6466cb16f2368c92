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


def test_streaming_sessionization_matches_batch(spark, tmp_path):
    """Closed sessions emitted by the stateful streaming sessionizer
    == the batch window sessionizer's sessions, minus each user's
    final (still-open) session."""
    import datetime as dt
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from historicaldatadocumentparsersystem_spark.streaming.sessions import (
        sessionize_stream)

    t0 = dt.datetime(2026, 1, 1, 8, 0, 0)

    def ev(uid, eid, minutes, val):
        return (uid, eid, t0 + dt.timedelta(minutes=minutes), float(val))

    # u1: 3 sessions (gaps 40+ min); u2: 1 long session; u3: 2 sessions
    rows = [ev(1, 1, 0, 1.5), ev(1, 2, 10, 2.0), ev(1, 3, 60, 3.25),
            ev(1, 4, 75, 0.5), ev(1, 5, 140, 9.0),
            ev(2, 6, 0, 4.0), ev(2, 7, 29, 4.0), ev(2, 8, 58, 4.0),
            ev(3, 9, 5, 7.75), ev(3, 10, 90, 1.0)]
    schema = "user_id long, event_id long, ts timestamp_ntz, value double"
    src = tmp_path / "sess_src"
    src.mkdir()
    # split MID-SESSION across micro-batches (u1's second session spans
    # files) to prove state carries the open session over
    spark.createDataFrame(rows[:3], schema).coalesce(1) \
        .write.parquet(str(src / "f1"))
    spark.createDataFrame(rows[3:], schema).coalesce(1) \
        .write.parquet(str(src / "f2"))

    out = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "sess_ckpt")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src / "*")))
    q = (sessionize_stream(stream)
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())

    # batch twin (the event_sessions query shape)
    bdf = spark.createDataFrame(rows, schema)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr("timestampdiff(MICROSECOND, lag_ts, ts)")
    sess = (bdf.withColumn("lag_ts", F.lag("ts").over(w))
            .withColumn("new_sess",
                        F.when(gap.isNull() | (gap > 1_800_000_000), 1)
                        .otherwise(0))
            .withColumn("session_no",
                        F.sum("new_sess").over(
                            w.rowsBetween(Window.unboundedPreceding, 0)))
            .groupBy("user_id", "session_no")
            .agg(F.count("*").alias("n_events"),
                 F.min("event_id").alias("first_event"),
                 F.round(F.sum("value"), 2).alias("session_value")))
    last = sess.groupBy("user_id").agg(
        F.max("session_no").alias("last_no"))
    closed_batch = (sess.join(last, "user_id")
                    .where(F.col("session_no") < F.col("last_no"))
                    .drop("last_no"))
    want = sorted(tuple(r) for r in closed_batch.collect())
    assert got == want and len(got) == 3
