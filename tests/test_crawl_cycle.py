"""Capstone integration: the full crawl cycle the discovery/index
layers compose — robots autodiscovery -> sitemap parse -> frontier
anti-join vs the capture history -> politeness schedule -> (fetch,
simulated by building the WARC + CDX artifacts) -> digest-dedup fetch
plan -> ranged member reads -> the extraction stage. Every hop is the
public operator, no test-only glue logic."""

from datetime import datetime, timezone

from pyspark.sql import functions as F

from historicaldatadocumentparsersystem_spark import pipeline
from historicaldatadocumentparsersystem_spark.extractor import cdxx, feedx, warcx
from historicaldatadocumentparsersystem_spark.operators import webtext
from historicaldatadocumentparsersystem_spark.operators.robots import (
    robots_sitemaps)
from historicaldatadocumentparsersystem_spark.sources import (
    read_cdx, read_sitemap_urls, read_warc_members)

_TS = datetime(2024, 6, 1, tzinfo=timezone.utc)


def _page(i: int) -> bytes:
    return (f"<html><head><title>Page {i}</title></head><body>"
            f"<div class=content><p>Real article text {i} "
            + ("lorem ipsum dolor sit amet " * 30)
            + "</p></div></body></html>").encode()


def test_crawl_cycle_end_to_end(spark, tmp_path):
    # 1. robots.txt points at the sitemap (autodiscovery)
    robots = (b"User-agent: *\nDisallow: /private\n"
              b"Sitemap: https://site.com/maps/map0.xml\n")
    (sitemaps,) = [s.rsplit("/", 1)[1] for s in robots_sitemaps(robots)]
    assert sitemaps == "map0.xml"

    # 2. the sitemap lists 6 urls; 2 were captured by an earlier crawl
    urls = [f"https://site.com/p{i}" for i in range(6)]
    (tmp_path / sitemaps).write_bytes(feedx.build_sitemap(
        [{"kind": "url", "loc": u, "lastmod": _TS,
          "changefreq": "daily" if i < 3 else None,
          "priority_bp": None}
         for i, u in enumerate(urls)]))
    discovered = read_sitemap_urls(spark, str(tmp_path / sitemaps))
    captured = spark.createDataFrame(
        [(cdxx.surt_key(u),) for u in urls[:2]], "urlkey string")

    # 3. frontier: only the 4 never-captured urls survive
    frontier = webtext.frontier_candidates(discovered, captured)
    assert {r["url"] for r in frontier.collect()} == set(urls[2:])

    # 4. politeness schedule: one host, budget 2 -> two batches
    sched = webtext.fetch_schedule(frontier, per_host_budget=2)
    batches = {r["url"]: r["batch"] for r in sched.collect()}
    assert sorted(batches.values()) == [0, 0, 1, 1]
    # priority-first: the 'daily' url (p2) fetches in batch 0
    assert batches["https://site.com/p2"] == 0

    # 5. the fetcher ran (simulated): WARC shard + CDX index for the
    # fetched batch-0 urls, plus a duplicate re-capture of one page
    fetched = sorted(u for u, b in batches.items() if b == 0)
    recs = [{"url": u, "warc_ts": _TS, "status": 200,
             "body": _page(int(u[-1]))} for u in fetched]
    recs.append({"url": fetched[0] + "-mirror", "warc_ts": _TS,
                 "status": 200, "body": recs[0]["body"]})  # same digest
    shard, cdx_rows = cdxx.build_warc_indexed(recs, gzip_records=True)
    shard_path = tmp_path / "fetch-0.warc.gz"
    shard_path.write_bytes(shard)
    import hashlib
    for r in cdx_rows:
        r["filename"] = str(shard_path)
        body = next(x["body"] for x in recs if x["url"] == r["url"])
        r["digest"] = hashlib.md5(body).hexdigest()
    (tmp_path / "fetch-0.cdxj").write_bytes(cdxx.build_cdxj(cdx_rows))

    # 6. fetch plan dedups the mirror by digest; ranged reads return
    # exactly the planned members, byte-identical
    plan = webtext.cdx_fetch_plan(
        read_cdx(spark, str(tmp_path / "fetch-0.cdxj")))
    planned = plan.collect()
    assert len(planned) == 2            # mirror collapsed
    docs = read_warc_members(plan, num_partitions=2)
    rows = docs.collect()
    bodies = {r["url"]: bytes(r["body"]) for r in rows}
    assert bodies == {u: _page(int(u[-1])) for u in fetched}

    # 7. the fetched members flow into the extraction stage unchanged
    docs_tbl = docs.select(
        "url", "warc_ts", F.col("body").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"))
    extracted = pipeline.extract_df(docs_tbl, num_buckets=2)
    out = {r["url"]: r for r in extracted.collect()}
    assert set(out) == set(fetched)
    for u in fetched:
        assert out[u]["doc_kind"] == "html"
        assert f"Real article text {int(u[-1])}" in out[u]["extracted_text"]
        assert out[u]["title"] == f"Page {int(u[-1])}"
