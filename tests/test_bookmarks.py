"""Netscape bookmarks + Web App Manifest: grammar vectors, golden
pin, Spark parity, fuzz."""

import random

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import (
    bookmarkx, manifestx)

GOLDEN_BOOKMARKS = "fixtures/golden_bookmarks_seed42_n12.parquet"

BCOLS = ["pos", "folder", "href", "title", "add_date",
         "last_modified", "tags"]


def _pure_rows(n: int) -> list[tuple]:
    out = []
    for r in fixtures.bookmark_file_rows(n):
        for b in bookmarkx.parse_bookmarks(r["payload"]):
            out.append((r["url"],) + tuple(b[c] for c in BCOLS))
    return out


def test_bookmark_vectors():
    raw = bookmarkx.build_bookmarks([
        {"href": "https://t.example/", "title": "Top",
         "add_date": 100},
        {"folder": "F1", "children": [
            {"href": "https://a.example/", "title": "A",
             "tags": "x,y"},
            {"folder": "F2", "children": [
                {"href": "https://b.example/", "title": "B"}]},
            {"href": "https://c.example/", "title": "C"},
        ]},
    ])
    rows = bookmarkx.parse_bookmarks(raw)
    assert [(r["folder"], r["href"]) for r in rows] == [
        (None, "https://t.example/"),
        ("F1", "https://a.example/"),
        ("F1/F2", "https://b.example/"),
        ("F1", "https://c.example/"),   # back out of F2 on </DL>
    ]
    # entity titles kept raw (linkx contract), whitespace normalized
    raw2 = (b"<DT><A HREF=\"https://e.example/\">A &amp;\n  B</A>")
    assert bookmarkx.parse_bookmarks(raw2)[0]["title"] == "A &amp; B"
    # epoch gates: >15 digits and negatives reject
    raw3 = (b'<DT><A HREF="u" ADD_DATE="-5">t</A>'
            b'<DT><A HREF="v" ADD_DATE="99999999999999999999">s</A>')
    got = bookmarkx.parse_bookmarks(raw3)
    assert [g["add_date"] for g in got] == [None, None]
    # stray </DL> ignored; href-less anchors skipped
    assert bookmarkx.parse_bookmarks(b"</DL><A>x</A>") == []
    assert bookmarkx.parse_bookmarks(None) == []


def test_manifest_vectors():
    d = manifestx.parse_manifest(manifestx.build_manifest(
        name="N", display="STANDALONE",
        icons=[{"src": "/a.png", "sizes": "1x1"},
               "junk", {"sizes": "2x2"}]))
    assert d["display"] == "standalone"
    assert d["icons"] == [(0, "/a.png", "1x1", None, None)]
    assert manifestx.parse_manifest(
        manifestx.build_manifest(display="popup"))["display"] is None
    assert manifestx.parse_manifest(b"[1]") is None
    assert manifestx.parse_manifest(b"nope") is None
    assert manifestx.parse_manifest(None) is None


def test_matches_committed_golden():
    golden = [(r["url"],) + tuple(r[c] for c in BCOLS)
              for r in pq.read_table(GOLDEN_BOOKMARKS).to_pylist()]
    assert golden == _pure_rows(12)
    assert len(golden) == 24


def test_spark_readers_match_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    files = fixtures.bookmark_file_rows(12)
    df = spark.createDataFrame(
        [(r["url"], r["payload"]) for r in files],
        "url string, payload binary").repartition(8)
    got = sorted(tuple(str(x) for x in r)
                 for r in sources.read_bookmarks(df).collect())
    want = sorted(tuple(str(x) for x in r) for r in _pure_rows(12))
    assert got == want
    mfiles = fixtures.manifest_file_rows(12)
    mdf = spark.createDataFrame(
        [(r["url"], r["payload"]) for r in mfiles],
        "url string, payload binary").repartition(8)
    assert sources.read_webmanifests(mdf).count() == 9
    icons = {(r.url, r.pos): r.src
             for r in sources.read_manifest_icons(mdf).collect()}
    want_icons = {}
    for r in mfiles:
        d = manifestx.parse_manifest(r["payload"])
        if d:
            for pos, src, *_ in d["icons"]:
                want_icons[(r["url"], pos)] = src
    assert icons == want_icons


def test_fuzz_never_raises():
    rng = random.Random(12)
    for _ in range(300):
        blob = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(0, 150)))
        assert isinstance(bookmarkx.parse_bookmarks(blob), list)
        manifestx.parse_manifest(blob)
