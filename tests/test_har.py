"""HAR capture source: grammar vectors, golden pin, Spark reader
parity, and never-raise fuzz."""

import random

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import harx

GOLDEN_HAR = "fixtures/golden_har_seed42_n12.parquet"

ECOLS = ["pos", "pageref", "started", "method", "request_url",
         "status", "status_text", "mime", "body_size",
         "content_size", "time_ms", "server_ip", "http_version"]


def _pure_rows(n: int) -> list[tuple]:
    out = []
    for r in fixtures.har_file_rows(n):
        for e in harx.parse_har(r["payload"])["entries"]:
            out.append((r["url"],) + tuple(e[c] for c in ECOLS))
    return out


def test_vectors():
    raw = harx.build_har(
        [{"id": "p1", "startedDateTime": "2026-01-01T00:00:00Z",
          "title": "t", "pageTimings": {"onLoad": 10.5,
                                        "onContentLoad": -1}}],
        [{"pageref": "p1",
          "request": {"method": "GET", "url": "https://a.example/"},
          "response": {"status": 200, "statusText": "OK",
                       "httpVersion": "h2", "bodySize": -1,
                       "content": {"size": 7,
                                   "mimeType":
                                   "Text/HTML; charset=UTF-8"}},
          "time": 5.25},
         "junk-entry",
         {"request": {"url": "https://b.example/x"},
          "response": {"status": 1234}}])
    d = harx.parse_har(raw)
    p = d["pages"][0]
    # negative timings normalize to None
    assert (p["on_load_ms"], p["on_content_load_ms"]) == (10.5, None)
    e0, e1 = d["entries"]
    assert e0["mime"] == "text/html"         # params stripped, lc
    assert e0["body_size"] is None           # -1 = unknown
    assert e0["content_size"] == 7
    assert e0["time_ms"] == 5.25
    # junk entry skipped; positions stay consecutive
    assert e1["pos"] == 1 and e1["method"] is None
    assert e1["status"] is None              # out of 0..999
    # non-HAR payloads yield zero rows
    assert harx.parse_har(b"[]")["entries"] == []
    assert harx.parse_har(b'{"log": []}')["entries"] == []
    assert harx.parse_har(b"\xff\xfe")["entries"] == []
    assert harx.parse_har(None)["entries"] == []


def test_matches_committed_golden():
    golden = [(r["url"],) + tuple(r[c] for c in ECOLS)
              for r in pq.read_table(GOLDEN_HAR).to_pylist()]
    assert golden == _pure_rows(12)
    assert len(golden) == 30


def test_spark_readers_match_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    files = fixtures.har_file_rows(12)
    df = spark.createDataFrame(
        [(r["url"], r["payload"]) for r in files],
        "url string, payload binary").repartition(8)
    got = sorted(tuple(str(x) for x in r)
                 for r in sources.read_har_entries(df).collect())
    want = sorted(tuple(str(x) for x in r) for r in _pure_rows(12))
    assert got == want
    pgot = sorted(tuple(str(x) for x in r)
                  for r in sources.read_har_pages(df).collect())
    pwant = sorted(
        (r["url"], str(p["page_id"]), str(p["started"]),
         str(p["title"]), str(p["on_content_load_ms"]),
         str(p["on_load_ms"]))
        for r in files
        for p in harx.parse_har(r["payload"])["pages"])
    assert pgot == pwant and len(pgot) == 9


def test_fuzz_never_raises():
    rng = random.Random(5)
    base = fixtures.har_file_rows(1)[0]["payload"]
    for _ in range(300):
        blob = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(0, 200)))
        assert isinstance(harx.parse_har(blob)["entries"], list)
    for i in range(0, len(base), 29):
        harx.parse_har(base[:i])
