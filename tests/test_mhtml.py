"""MHTML source: round-trip vectors, golden pin, Spark reader
parity, and never-raise fuzz."""

import random

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import mhtmlx

GOLDEN_MHTML = "fixtures/golden_mhtml_seed42_n16.parquet"


def _pure_rows(n: int) -> list[tuple]:
    out = []
    for r in fixtures.mhtml_file_rows(n):
        d = mhtmlx.parse_mhtml(r["payload"])
        for p in d["parts"]:
            out.append((r["url"], d["url"], p["pos"],
                        p["content_type"], p["content_location"],
                        p["content_id"], p["pos"] == d["root_pos"],
                        p["size"]))
    return out


def test_roundtrip_and_root_selection():
    html = "<html><body><p>snapshot</p></body></html>"
    raw = mhtmlx.build_mhtml("bd", [
        {"content_type": "text/html; charset=utf-8",
         "location": "https://e.org/p", "cid": "r0", "text": html},
        {"content_type": "image/png",
         "location": "https://e.org/i.png", "body": b"\x89PNG" * 4},
    ], snapshot_url="https://e.org/p", start="r0")
    d = mhtmlx.parse_mhtml(raw)
    assert d["url"] == "https://e.org/p" and d["root_pos"] == 0
    assert [p["content_type"] for p in d["parts"]] == \
        ["text/html", "image/png"]
    assert d["parts"][1]["size"] == 16
    assert mhtmlx.root_html(raw) == ("https://e.org/p", html)
    # start selects a later part; snapshot header absent -> url
    # falls back to the ROOT's Content-Location
    raw2 = mhtmlx.build_mhtml("b2", [
        {"content_type": "text/plain", "location": "https://e.org/a",
         "text": "noise"},
        {"content_type": "text/html", "cid": "real",
         "location": "https://e.org/b", "text": "<p>b</p>"},
    ], start="real")
    d2 = mhtmlx.parse_mhtml(raw2)
    assert d2["root_pos"] == 1 and d2["url"] == "https://e.org/b"
    # unknown start falls back to first part
    raw3 = raw2.replace(b'start="<real>"', b'start="<ghost>"')
    assert mhtmlx.parse_mhtml(raw3)["root_pos"] == 0
    # quoted-printable specials survive the round trip
    raw4 = mhtmlx.build_mhtml("b4", [
        {"content_type": "text/html; charset=utf-8",
         "location": "https://e.org/q",
         "text": "<p>Café = 100% naïve</p>"}])
    assert mhtmlx.root_html(raw4)[1] == "<p>Café = 100% naïve</p>"


def test_rejects_non_related():
    # multipart/mixed is mail, not a page snapshot
    raw = (b"MIME-Version: 1.0\r\n"
           b'Content-Type: multipart/mixed; boundary="x"\r\n\r\n'
           b"--x\r\nContent-Type: text/html\r\n\r\n<p>n</p>\r\n"
           b"--x--\r\n")
    assert mhtmlx.parse_mhtml(raw)["parts"] == []
    assert mhtmlx.parse_mhtml(b"")["parts"] == []
    assert mhtmlx.parse_mhtml(None)["parts"] == []
    # non-HTML root -> empty page text but resources still listed
    raw2 = mhtmlx.build_mhtml("b", [
        {"content_type": "text/plain", "location": "https://e.org/t",
         "text": "txt"}])
    assert mhtmlx.root_html(raw2) == ("https://e.org/t", "")
    assert len(mhtmlx.parse_mhtml(raw2)["parts"]) == 1


def test_matches_committed_golden():
    golden = [(r["url"], r["snapshot_url"], r["pos"],
               r["content_type"], r["content_location"],
               r["content_id"], r["is_root"], r["size"])
              for r in pq.read_table(GOLDEN_MHTML).to_pylist()]
    assert golden == _pure_rows(16)
    assert len(golden) == 30


def test_spark_readers_match_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    from historicaldatadocumentparsersystem_spark.extractor import \
        htmlx
    files = fixtures.mhtml_file_rows(16)
    df = spark.createDataFrame(
        [(r["url"], r["payload"]) for r in files],
        "url string, payload binary").repartition(8)
    got = sorted(tuple(str(x) for x in r)
                 for r in sources.read_mhtml_resources(df).collect())
    want = sorted(tuple(str(x) for x in r) for r in _pure_rows(16))
    assert got == want
    pages = {r.url: (r.snapshot_url, r.title, r.text)
             for r in sources.read_mhtml_pages(df).collect()}
    expect = {}
    for r in files:
        snap, html = mhtmlx.root_html(r["payload"])
        if html:
            text, _s, _sc, title = htmlx.extract_html(html)
            expect[r["url"]] = (snap, title, text)
    assert pages == expect
    assert len(pages) == 10  # shapes k=0 (x4), k=1 (x3), k=2 (x3)


def test_fuzz_never_raises():
    rng = random.Random(11)
    base = fixtures.mhtml_file_rows(5)[0]["payload"]
    for _ in range(300):
        blob = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(0, 300)))
        assert isinstance(mhtmlx.parse_mhtml(blob)["parts"], list)
    for i in range(0, len(base), 13):
        mhtmlx.parse_mhtml(base[:i])
        mut = bytearray(base)
        mut[i] ^= 0x55
        mhtmlx.parse_mhtml(bytes(mut))
