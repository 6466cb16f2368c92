"""Subtitle sources (SRT/WebVTT): extractor/subx.py (golden-pinned),
format detection, decoding, tag stripping and the Spark reader."""

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import subx

GOLDEN_SUBS = "fixtures/golden_subtitles_seed42_n36.parquet"


def _pure_rows(n: int) -> list[tuple]:
    out = []
    for r in fixtures.subtitle_file_rows(n):
        for c in subx.parse_subtitles(r["payload"]):
            out.append((r["url"], *c))
    return out


def test_subtitles_match_committed_golden():
    golden = [(r["url"], r["pos"], r["start_ms"], r["end_ms"], r["text"])
              for r in pq.read_table(GOLDEN_SUBS).to_pylist()]
    assert golden == _pure_rows(36)
    assert len(golden) == 102


def test_srt_blocks_tags_and_tolerance():
    srt = ("1\n00:00:01,000 --> 00:00:04,200\n"
           "<i>Hello</i> world &amp; more\n\n"
           "junk block\nwithout any timestamp\n\n"
           "00:01:00.500 --> 00:01:02,000\n"
           "Index-less cue\nline two\n\n"
           "3\n00:00:09,000 --> 00:00:09,500\n<b></b>\n")
    assert subx.parse_srt(srt) == [
        (0, 1000, 4200, "Hello world & more"),
        (1, 60500, 62000, "Index-less cue\nline two")]
    # ASS override blocks are stripped; CRLF and bare CR both split
    srt = "1\r\n00:00:01,000 --> 00:00:02,000\r\n{\\an8}top text\r\n"
    assert subx.parse_srt(srt) == [(0, 1000, 2000, "top text")]


def test_vtt_header_notes_settings_and_hourless():
    vtt = ("WEBVTT - title\nKind: captions\n\n"
           "NOTE a comment\nmore comment\n\n"
           "id-1\n00:01.000 --> 00:04.000 align:start position:10%\n"
           "<v Ana>Hi</v> there\n\n"
           "STYLE\n::cue { color: red }\n\n"
           "01:00:00.000 --> 01:00:02.500\n<c.y>Final</c>\n")
    assert subx.parse_vtt(vtt) == [
        (0, 1000, 4000, "Hi there"),
        (1, 3600000, 3602500, "Final")]
    # inline timestamps (karaoke) are tags too
    vtt = "WEBVTT\n\n00:01.000 --> 00:02.000\na<00:00:01.500>b\n"
    assert subx.parse_vtt(vtt) == [(0, 1000, 2000, "ab")]


def test_decoding_bom_utf16_and_legacy():
    body = "1\n00:00:01,000 --> 00:00:02,000\ncaf\xe9 legacy\n"
    assert subx.parse_subtitles(body.encode("cp1252"))[0][3] \
        == "café legacy"
    assert subx.parse_subtitles(
        b"\xef\xbb\xbf" + body.encode("utf-8"))[0][3] == "café legacy"
    raw = "WEBVTT\n\n00:01.000 --> 00:02.000\nutf16 cue\n"
    assert subx.parse_subtitles(
        b"\xff\xfe" + raw.encode("utf-16-le")) == [
        (0, 1000, 2000, "utf16 cue")]


def test_malformed_never_raises():
    import random
    rng = random.Random("subx-fuzz")
    for _ in range(200):
        payload = bytes(rng.randrange(256)
                        for _ in range(rng.randrange(400)))
        for row in subx.parse_subtitles(payload):
            assert len(row) == 4 and row[3].strip()
    for p in (b"", b"WEBVTT", b"1\n00:00 --> bad\nx", None):
        assert subx.parse_subtitles(p) == []


def test_reader_matches_golden(spark):
    from historicaldatadocumentparsersystem_spark import sources
    files = fixtures.subtitle_file_rows(36)
    df = spark.createDataFrame(
        [(r["url"], r["payload"]) for r in files],
        "url string, payload binary").repartition(8)
    got = sorted(tuple(r)
                 for r in sources.read_subtitle_cues(df).collect())
    golden = sorted(
        (r["url"], r["pos"], r["start_ms"], r["end_ms"], r["text"])
        for r in pq.read_table(GOLDEN_SUBS).to_pylist())
    assert got == golden
    flat = spark.createDataFrame(
        [(r["url"], r["payload"]) for r in files[:6]],
        "url string, payload binary")
    plan = (sources.read_subtitle_cues(flat)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


# --- TTML (broadcast/IMSC timed text) -----------------------------------------

def test_ttml_cues_and_time_expressions():
    ttml = ('<?xml version="1.0"?>'
            '<tt xmlns="http://www.w3.org/ns/ttml"><body><div>'
            '<p begin="00:00:01.500" end="00:00:04.000">First'
            '<br/>second</p>'
            '<p begin="5.2s" dur="2s"><span>Styled</span> tail</p>'
            '<p end="10s">no begin dropped</p>'
            '<p begin="1s">no end or dur dropped</p>'
            '</div></body></tt>')
    assert subx.parse_ttml(ttml) == [
        (0, 1500, 4000, "First\nsecond"),
        (1, 5200, 7200, "Styled tail")]
    # detection: XML payloads route to TTML, non-tt XML yields none
    assert subx.parse_subtitles(ttml.encode()) \
        == subx.parse_ttml(ttml)
    assert subx.parse_subtitles(b"<html><p>x</p></html>") == []
    # exact time arithmetic; frame-based clock times unsupported
    assert subx._ttml_ms("00:01:02.25") == 62_250
    assert subx._ttml_ms("300ms") == 300
    assert subx._ttml_ms("2.5h") == 9_000_000
    assert subx._ttml_ms("1.25m") == 75_000
    assert subx._ttml_ms("00:00:05:12") is None
    assert subx._ttml_ms("junk") is None


def test_ttml_never_raises_on_fuzz():
    import random
    rng = random.Random("ttml-fuzz")
    blobs = [b"<" + bytes(rng.randrange(256) for _ in range(
        rng.randrange(200))) for _ in range(100)]
    good = ('<tt xmlns="x"><body><p begin="1s" end="2s">t</p>'
            '</body></tt>').encode()
    blobs += [good[:i] for i in range(0, len(good), 7)]
    for blob in blobs:
        for r in subx.parse_subtitles(blob):
            assert len(r) == 4
