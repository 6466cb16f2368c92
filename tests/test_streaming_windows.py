"""Watermarked event-time windowed aggregation over the document stream."""

from pyspark.sql import functions as F

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.streaming.windows import (
    windowed_doc_counts)


def test_windowed_counts_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    docs = fixtures.corpus_df(spark, 200, num_partitions=4)
    docs.write.parquet(src)

    out = str(tmp_path / "out")
    stream = (spark.readStream
              .schema("url string, warc_ts timestamp, html binary, "
                      "text string, lang string")
              .option("maxFilesPerTrigger", 2).parquet(src))
    q = (windowed_doc_counts(stream)
         .writeStream.format("parquet").outputMode("append")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    streamed = {(r.window_start, r.host): (r.n_docs, r.bytes_in)
                for r in spark.read.parquet(out).collect()}
    batch = {(r.window_start, r.host): (r.n_docs, r.bytes_in)
             for r in windowed_doc_counts(docs).collect()}
    # append-mode emits only windows fully past the watermark; every
    # emitted window must match the batch computation exactly
    assert streamed
    for key, val in streamed.items():
        assert batch[key] == val, key
    # the fixture ramp spans hours: most windows are closed and emitted
    assert len(streamed) >= 0.5 * len(batch)
    total_streamed = sum(v[0] for v in streamed.values())
    assert total_streamed <= 200
