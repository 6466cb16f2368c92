"""WARC source: pure-Python round-trip + Spark reader + extraction
byte-identity vs the direct (parquet-style) path."""

from datetime import datetime, timezone

from pyspark.sql import functions as F

from historicaldatadocumentparsersystem_spark import fixtures, pipeline
from historicaldatadocumentparsersystem_spark.extractor import warcx
from historicaldatadocumentparsersystem_spark.sources import (
    read_warc_documents)


def _records(n=30):
    rows = fixtures.generate_rows(n)
    return [{"url": r["url"], "warc_ts": r["warc_ts"].replace(
                tzinfo=timezone.utc),
             "status": 200, "body": r["html"] or b""}
            for r in rows]


def test_roundtrip_plain_and_gzip():
    recs = _records()
    for gz in (False, True):
        got = warcx.parse_warc(warcx.build_warc(recs, gzip_records=gz))
        assert [(g["url"], g["warc_ts"], g["body"]) for g in got] == \
            [(r["url"], r["warc_ts"], r["body"]) for r in recs]
        assert all(g["status"] == 200 for g in got)


def test_parse_skips_non_response_and_truncated():
    recs = _records(5)
    data = warcx.build_warc(recs)
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
            b"Content-Length: 4\r\n\r\nabcd\r\n\r\n")
    # truncated trailer: header promises more bytes than remain
    trunc = (b"WARC/1.0\r\nWARC-Type: response\r\n"
             b"WARC-Target-URI: https://t/x\r\n"
             b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
             b"Content-Length: 99999\r\n\r\nshort")
    got = warcx.parse_warc(info + data + trunc)
    assert len(got) == 5
    assert got[0]["url"] == recs[0]["url"]


def test_parse_never_raises_on_junk():
    for junk in (b"", b"WARC/1.0\r\n\r\n", b"\x1f\x8bnot-gzip",
                 b"WARC/1.0\r\nContent-Length: x\r\n\r\n", b"random"):
        assert isinstance(warcx.parse_warc(junk), list)


def test_spark_warc_extraction_matches_direct(spark, tmp_path):
    """The north-star chain: WARC shards -> read_warc_documents ->
    extract_df must produce byte-identical extracted text to feeding
    the same pages directly (modulo the text-fallback rows, which a
    WARC has no fallback column for)."""
    rows = [r for r in fixtures.generate_rows(40) if r["html"]]
    recs = [{"url": r["url"], "warc_ts": r["warc_ts"].replace(
                 tzinfo=timezone.utc), "status": 200, "body": r["html"]}
            for r in rows]
    # two shards, second gzipped per record
    (tmp_path / "shard0.warc").write_bytes(warcx.build_warc(recs[:20]))
    (tmp_path / "shard1.warc.gz").write_bytes(
        warcx.build_warc(recs[20:], gzip_records=True))

    docs = read_warc_documents(spark, str(tmp_path) + "/*")
    assert docs.columns == ["url", "warc_ts", "html", "text", "lang"]
    got = {r["url"]: (r["doc_kind"], r["extracted_text"], r["score"])
           for r in pipeline.extract_df(docs, num_buckets=4).collect()}

    direct_docs = fixtures.corpus_df(spark, 40).where(
        F.col("html").isNotNull())
    want = {r["url"]: (r["doc_kind"], r["extracted_text"], r["score"])
            for r in pipeline.extract_df(
                direct_docs, num_buckets=4).collect()}
    assert got == want
    assert len(got) == len(rows)


# --- property tests ----------------------------------------------------------

from hypothesis import given, settings, strategies as st

_bodies = st.lists(
    st.binary(max_size=300).map(
        # adversarial: embed record markers inside bodies — the parser
        # must honor Content-Length, never resync on the marker
        lambda b: b + b"\r\n\r\nWARC/1.0\r\n" if len(b) % 3 == 0 else b),
    min_size=1, max_size=8)


@given(_bodies, st.booleans())
@settings(max_examples=60, deadline=None)
def test_warc_roundtrip_property(bodies, gz):
    recs = [{"url": f"https://h{i}.com/p", "status": 200,
             "warc_ts": datetime(2024, 1, 1, tzinfo=timezone.utc),
             "body": b} for i, b in enumerate(bodies)]
    got = warcx.parse_warc(warcx.build_warc(recs, gzip_records=gz))
    assert [(g["url"], g["body"]) for g in got] == \
        [(r["url"], r["body"]) for r in recs]


@given(st.binary(max_size=2048))
@settings(max_examples=150, deadline=None)
def test_warc_parse_arbitrary_bytes_never_raises(data):
    assert isinstance(warcx.parse_warc(data), list)
