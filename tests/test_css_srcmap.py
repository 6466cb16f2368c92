"""CSS reference miner + source maps: grammar/VLQ vectors, golden
pins, Spark parity, fuzz."""

import json
import random

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import (
    cssx, srcmapx)

GOLDEN_CSS = "fixtures/golden_css_seed42_n12.parquet"
GOLDEN_SM = "fixtures/golden_sourcemaps_seed42_n12.parquet"


def test_css_vectors():
    css = ('/* url(no.png) */\n@import url("b.css");\n'
           "@font-face { src: url(f.woff2) format(\"woff2\"); }\n"
           ".a { background: url( 'i.jpg' ); }\n"
           ".s { content: \"url(fake.png) @import 'no.css'\"; }\n"
           ".d { background: url(data:image/gif;base64,R0); }\n"
           ".e { cursor: url(we\\ ird.cur); }")
    rows = cssx.parse_css_refs(css)
    assert [(r["kind"], r["url"]) for r in rows] == [
        ("import", "b.css"), ("font", "f.woff2"),
        ("asset", "i.jpg"), ("asset", "data:image/gif;base64,R0"),
        ("asset", "we ird.cur")]
    assert rows[3]["is_data"] and not rows[0]["is_data"]
    # word boundary, empty url, nested braces in font-face
    assert cssx.parse_css_refs("a{b:xurl(x.png)}") == []
    assert cssx.parse_css_refs("a{b:url( )}") == []
    deep = "@font-face { @media x { src: url(n.woff); } } " \
           ".out { background: url(o.png); }"
    kinds = [r["kind"] for r in cssx.parse_css_refs(deep)]
    assert kinds == ["font", "asset"]
    assert cssx.parse_css_refs(None) == []


def test_vlq_codec():
    rng = random.Random(1)
    for _ in range(1000):
        vals = [rng.randrange(-10**6, 10**6)
                for _ in range(rng.randrange(1, 6))]
        assert srcmapx.vlq_decode(srcmapx.vlq_encode(vals)) == vals
    assert srcmapx.vlq_encode([16]) == "gB"      # spec vector
    assert srcmapx.vlq_decode("AAAA") == [0, 0, 0, 0]
    assert srcmapx.vlq_decode("!") is None
    assert srcmapx.vlq_decode("g") is None       # dangling cont.


def test_sourcemap_semantics():
    raw = srcmapx.build_sourcemap(
        file="a.min.js", sources=["s0.js", "s1.js"],
        names=["n"], lines=[
            [[0, 0, 0, 0], [5, 0, 0, 8], [12, 1, 2, 0, 0]],
            [],
            [[0, 1, 3, 1], [7, 0, 4, 2, 0]],
        ], content_for={0})
    d = srcmapx.parse_sourcemap(raw)
    assert d["n_lines"] == 3 and d["n_segments"] == 5
    # relative source-index cumulation: s0 gets 3 segments
    assert d["sources"] == [(0, "s0.js", True, 3),
                            (1, "s1.js", False, 2)]
    # malformed VLQ drops the rest of THAT line only
    doc = json.loads(raw)
    doc["mappings"] = "AAAA,!x,AAAA;AACA"
    d2 = srcmapx.parse_sourcemap(json.dumps(doc).encode())
    assert d2["n_segments"] == 2
    assert srcmapx.parse_sourcemap(b'{"version": 2}') is None
    assert srcmapx.parse_sourcemap(b"x") is None
    assert srcmapx.parse_sourcemap(None) is None


def test_match_committed_goldens():
    got = []
    for r in fixtures.css_file_rows(12):
        for c in cssx.parse_css_refs(r["payload"]):
            got.append((r["url"], c["pos"], c["kind"], c["url"],
                        c["is_data"]))
    golden = [(r["url"], r["pos"], r["kind"], r["ref"],
               r["is_data"])
              for r in pq.read_table(GOLDEN_CSS).to_pylist()]
    assert golden == got and len(golden) == 33
    got = []
    for r in fixtures.sourcemap_file_rows(12):
        d = srcmapx.parse_sourcemap(r["payload"])
        if d is None:
            continue
        for pos, src, has_c, nseg in d["sources"]:
            got.append((r["url"], d["file"], d["source_root"],
                        pos, src, has_c, nseg))
    golden = [(r["url"], r["file"], r["source_root"], r["pos"],
               r["source"], r["has_content"], r["n_segments"])
              for r in pq.read_table(GOLDEN_SM).to_pylist()]
    assert golden == got and len(golden) == 24


def test_spark_readers_match_golden(spark):
    from historicaldatadocumentparsersystem_spark import sources
    cdf = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.css_file_rows(12)],
        "url string, payload binary").repartition(8)
    got = sorted(tuple(str(x) for x in r)
                 for r in sources.read_css_refs(cdf).collect())
    want = sorted(tuple(str(x) for x in r)
                  for r in (
                      (r["url"], r["pos"], r["kind"], r["ref"],
                       r["is_data"])
                      for r in pq.read_table(GOLDEN_CSS)
                      .to_pylist()))
    assert got == want
    sdf = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.sourcemap_file_rows(12)],
        "url string, payload binary").repartition(8)
    assert sources.read_sourcemap_sources(sdf).count() == 24


def test_fuzz_never_raises():
    rng = random.Random(14)
    for _ in range(300):
        blob = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(0, 150)))
        assert isinstance(cssx.parse_css_refs(blob), list)
        srcmapx.parse_sourcemap(blob)
        srcmapx.vlq_decode(blob.decode("latin1")[:20])
