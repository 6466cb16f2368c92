"""Structured Streaming extraction: same bytes as batch, checkpointed."""

from historicaldatadocumentparsersystem_spark import fixtures, pipeline
from historicaldatadocumentparsersystem_spark.catalog import Catalog
from historicaldatadocumentparsersystem_spark.streaming import run_stream_once


def test_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    docs = fixtures.corpus_df(spark, 120, num_partitions=4)
    docs.write.parquet(src)

    out = str(tmp_path / "out")
    run_stream_once(spark, src, out, run_id="stream-r1", num_buckets=4)

    streamed = {r.url: (r.extracted_text, r.doc_kind)
                for r in Catalog(out).read_extracted(spark).collect()}
    batch = {r.url: (r.extracted_text, r.doc_kind)
             for r in pipeline.extract_df(docs, num_buckets=4).collect()}
    assert streamed == batch

    lin = Catalog(out).read_lineage(spark)
    assert lin.groupBy().sum("input_rows").first()[0] == 120

    # re-running with the same checkpoint processes nothing new
    run_stream_once(spark, src, out, run_id="stream-r2", num_buckets=4)
    again = Catalog(out).read_extracted(spark).count()
    assert again == 120


def test_stream_replayed_batch_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: simulate a full replay by wiping
    the checkpoint (every batch re-fires with the same batch ids) and
    assert the sink converges instead of appending duplicates."""
    import shutil

    src = str(tmp_path / "src")
    fixtures.corpus_df(spark, 60, num_partitions=2).write.parquet(src)
    out = str(tmp_path / "out")
    run_stream_once(spark, src, out, run_id="r1", num_buckets=4)
    lineage_rows = Catalog(out).read_lineage(spark).count()

    shutil.rmtree(f"{out}/_checkpoint")  # forget progress -> replay all
    run_stream_once(spark, src, out, run_id="r1-replay", num_buckets=4)

    assert Catalog(out).read_extracted(spark).count() == 60
    assert Catalog(out).read_lineage(spark).count() == lineage_rows


def test_discovery_stream_incremental_and_dedup(spark, tmp_path):
    """Sitemap shards stream in across two availableNow runs: the
    frontier accumulates only NOVEL urlkeys (www/param-order variants
    unify via SURT), captured urls never enter, and re-discovered
    urls in later shards are dropped."""
    from historicaldatadocumentparsersystem_spark.extractor import feedx
    from historicaldatadocumentparsersystem_spark.streaming.stream import (
        read_frontier, run_discovery_stream_once)

    src = tmp_path / "maps"
    out = tmp_path / "disc"
    src.mkdir()

    def entry(loc, freq=None):
        return {"kind": "url", "loc": loc, "lastmod": None,
                "changefreq": freq, "priority_bp": None}

    captured = spark.createDataFrame(
        [("com,site)/old",)], "urlkey string")
    (src / "m0.xml").write_bytes(feedx.build_sitemap([
        entry("https://site.com/a", "daily"),
        entry("https://www.site.com/a?x=1&b=2"),      # variant of /a? no: different path-query => distinct
        entry("https://site.com/old"),                 # already captured
        entry("https://site.com/b")]))
    run_discovery_stream_once(spark, str(src), str(out),
                              captured=captured)
    f1 = {r["urlkey"]: r for r in read_frontier(spark, str(out)).collect()}
    assert "com,site)/old" not in f1
    assert set(f1) == {"com,site)/a", "com,site)/a?b=2&x=1",
                       "com,site)/b"}
    assert f1["com,site)/a"]["changefreq"] == "daily"

    # second shard arrives: one novel url + two re-discoveries
    (src / "m1.xml").write_bytes(feedx.build_sitemap([
        entry("https://site.com/b"),                   # seen batch 1
        entry("https://WWW.site.com/a"),               # SURT dup of /a
        entry("https://site.com/c")]))
    run_discovery_stream_once(spark, str(src), str(out),
                              captured=captured)
    f2 = read_frontier(spark, str(out))
    rows = f2.collect()
    assert len(rows) == len(f1) + 1
    assert {r["urlkey"] for r in rows} == set(f1) | {"com,site)/c"}
    # each urlkey appears exactly once across all batch partitions
    assert f2.groupBy("urlkey").count().agg(
        {"count": "max"}).collect()[0][0] == 1


def test_discovery_stream_from_feeds(spark, tmp_path):
    """RSS/Atom feeds drive the same frontier sink: novel urls land,
    re-announcements and captured urls are dropped."""
    from datetime import datetime, timezone
    from historicaldatadocumentparsersystem_spark.extractor import feedx
    from historicaldatadocumentparsersystem_spark.streaming.stream import (
        read_frontier, run_discovery_stream_once)
    src = tmp_path / "feeds"
    out = tmp_path / "disc"
    src.mkdir()
    ts = datetime(2024, 8, 1, tzinfo=timezone.utc)
    (src / "a.rss").write_bytes(feedx.build_feed(
        [{"feed_kind": "rss", "url": "https://blog.io/n1",
          "title": "n1", "pub_ts": ts},
         {"feed_kind": "rss", "url": "https://www.blog.io/n1?b=1&a=2",
          "title": "distinct query", "pub_ts": ts},
         {"feed_kind": "rss", "url": "https://blog.io/old",
          "title": "old", "pub_ts": ts}]))
    captured = spark.createDataFrame(
        [("io,blog)/old",)], "urlkey string")
    run_discovery_stream_once(spark, str(src), str(out),
                              captured=captured, source_format="feed")
    f1 = {r["urlkey"] for r in read_frontier(spark, str(out)).collect()}
    assert f1 == {"io,blog)/n1", "io,blog)/n1?a=2&b=1"}
    # a later atom feed re-announces n1 and adds one novel entry
    (src / "b.atom").write_bytes(feedx.build_feed(
        [{"feed_kind": "atom", "url": "https://blog.io/n1",
          "title": None, "pub_ts": None},
         {"feed_kind": "atom", "url": "https://blog.io/n2",
          "title": None, "pub_ts": None}]))
    run_discovery_stream_once(spark, str(src), str(out),
                              captured=captured, source_format="feed")
    f2 = read_frontier(spark, str(out))
    assert {r["urlkey"] for r in f2.collect()} == f1 | {"io,blog)/n2"}
    assert f2.groupBy("urlkey").count().agg(
        {"count": "max"}).collect()[0][0] == 1


def test_artifacts_stream_equals_batch(spark, tmp_path):
    """Streaming one-parse artifacts == the batch operator over the
    same documents, and a replayed run is idempotent (batch_id
    partitions rewrite themselves via dynamic overwrite)."""
    from historicaldatadocumentparsersystem_spark import fixtures
    from historicaldatadocumentparsersystem_spark.operators import pagemeta
    from historicaldatadocumentparsersystem_spark.streaming.stream import (
        run_artifacts_stream_once)

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    docs = fixtures.corpus_df(spark, 80, num_partitions=4)
    docs.write.parquet(src)

    run_artifacts_stream_once(spark, src, out, max_files_per_trigger=2)
    streamed = spark.read.parquet(f"{out}/artifacts")
    batch = pagemeta.page_artifacts(spark.read.parquet(src))

    key = lambda r: r["url"]
    srows = sorted(streamed.drop("batch_id").collect(), key=key)
    brows = sorted(batch.collect(), key=key)
    assert srows == brows and len(srows) > 60

    # replay with a fresh checkpoint: same deterministic partitions
    import shutil
    shutil.rmtree(f"{out}/_checkpoint")
    run_artifacts_stream_once(spark, src, out, max_files_per_trigger=2)
    again = sorted(spark.read.parquet(f"{out}/artifacts")
                   .drop("batch_id").collect(), key=key)
    assert again == brows
