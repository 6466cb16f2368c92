"""RTF source: extractor/rtfx.py (golden-pinned), the Word-spec
tokenizer semantics, the per-format dispatch and the Spark reader."""

import pyarrow.parquet as pq
import pytest

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import core, rtfx
from historicaldatadocumentparsersystem_spark.extractor.sniff import sniff_kind

GOLDEN_RTF = "fixtures/golden_rtf_elements_seed42_n40.parquet"


def _pure_rows(n: int) -> list[tuple]:
    out = []
    for r in fixtures.rtf_file_rows(n):
        try:
            els = rtfx.extract_rtf(r["payload"])
        except ValueError:
            continue
        for el in els:
            out.append((r["url"], el.para, el.kind, el.level, el.text))
    return out


def test_rtf_matches_committed_golden():
    golden = [(r["url"], r["para"], r["kind"], r["level"], r["text"])
              for r in pq.read_table(GOLDEN_RTF).to_pylist()]
    assert golden == _pure_rows(40)
    assert len(golden) == 175


def _texts(data: bytes) -> list[str]:
    return [e.text for e in rtfx.extract_rtf(data)]


def test_control_words_symbols_and_escapes():
    data = (rb"{\rtf1\ansi\ansicpg1252 a\tab b\line c\~d\-e\_f"
            rb" \{g\} \\h \'e9\par}")
    assert _texts(data) == ["a\tb\nc\xa0d" "e‑f {g} \\h é"]
    # \<newline> is a \par alias; raw newlines are ignored
    data = b"{\\rtf1 one\\\ntwo\r\nstill two\\par}"
    assert _texts(data) == ["one", "twostill two"]


def test_unicode_uc_skip_and_negative():
    # \uc1: the single fallback char after \uN is swallowed
    assert _texts(rb"{\rtf1\uc1 x\u8364?y\par}") == ["x\u20acy"]
    # \uc2 swallows two fallback chars; a \'xx escape counts as ONE
    assert _texts(rb"{\rtf1\uc2 x\u8364\'80zy\par}") == ["x\u20acy"]
    # \uc is group-scoped and restored on }
    assert _texts(rb"{\rtf1\uc1 {\uc0\u65}\u66?C\par}") == ["ABC"]
    # negative \uN wraps into the BMP (+65536)
    assert _texts(rb"{\rtf1\uc1 \u-1536?\par}") == ["\ufa00"]


def test_codepage_multibyte_and_switch():
    # cp932 double-byte pair decodes as one char
    assert _texts(rb"{\rtf1\ansicpg932 \'93\'fa\par}") == ["日"]
    # cp1251 single bytes
    assert _texts(rb"{\rtf1\ansicpg1251 \'e0\'e1\par}") == ["аб"]


def test_destinations_and_star_groups_skipped():
    data = (rb"{\rtf1{\fonttbl{\f0 Arial;}}{\colortbl;\red1\green2\blue3;}"
            rb"{\info{\title secret}}{\*\mystery hidden {\nested x}}"
            rb"{\stylesheet{\s1\outlinelevel0 H;}}visible\par}")
    els = rtfx.extract_rtf(data)
    assert [e.text for e in els] == ["visible"]
    # \outlinelevel inside the skipped stylesheet never marks a heading
    assert els[0].kind == "text"
    # \binN skips raw bytes (even braces)
    assert _texts(rb"{\rtf1 a\bin5 }}}}}b\par}") == ["ab"]


def test_paragraph_model_headings_and_lists():
    data = (rb"{\rtf1\pard\outlinelevel1 Head\par"
            rb"\pard{\pntext\f0\'b7\tab}\ilvl2 item\par"
            rb"\pard plain\par"
            rb"\pard cell one\cell cell two\cell\row}")
    els = rtfx.extract_rtf(data)
    assert [(e.kind, e.level, e.text) for e in els] == [
        ("heading", 2, "Head"),
        ("list_item", 3, "item"),
        ("text", 0, "plain"),
        ("text", 0, "cell one\tcell two\t")]
    # outlinelevel persists across \par until \pard (spec)
    data = rb"{\rtf1\outlinelevel0 a\par b\par\pard c\par}"
    assert [(e.kind, e.text) for e in rtfx.extract_rtf(data)] == [
        ("heading", "a"), ("heading", "b"), ("text", "c")]
    # whitespace-only paragraphs are dropped; EOF flushes the last one
    assert _texts(rb"{\rtf1  \par\tab\par tail") == ["tail"]


def test_non_rtf_raises_and_sniff_dispatch():
    with pytest.raises(ValueError):
        rtfx.extract_rtf(b"not rtf at all")
    assert sniff_kind(b"{\\rtf1 x\\par}") == "rtf"
    assert sniff_kind(b"\xef\xbb\xbf  {\\rtf1 x}") == "rtf"
    res = core.extract_document(b"{\\rtf1 one\\par two\\par}", None)
    assert res.doc_kind == "rtf" and res.extracted_text == "one\ntwo"
    assert res.spans == [(0, 3, "text"), (4, 7, "text")]
    # {\rtf magic but nothing extractable -> fallback, failed (F5)
    res = core.extract_document(b"{\\rtf1{\\info junk}}", "fb")
    assert res.doc_kind == "empty" and res.failed


def test_malformed_never_raises_after_magic():
    import random
    rng = random.Random("rtfx-fuzz")
    for _ in range(300):
        body = bytes(rng.randrange(256) for _ in range(rng.randrange(400)))
        for el in rtfx.extract_rtf(b"{\\rtf1" + body):
            assert el.text.strip()
    # pathological nesting / truncated escapes
    for tail in (b"{" * 200, b"}" * 200, b"\\u", b"\\'f", b"\\", b"\\bin9"):
        rtfx.extract_rtf(b"{\\rtf1 x" + tail)


def test_encode_half_roundtrips_exactly():
    paras = [("heading", 1, "Café — über"), ("list_item", 2, "нет"),
             ("text", 0, "tab\tand\nbreak {x} \\y"),
             ("heading", 3, "日本語")]
    for cp in (1252, 65001, 932, 1251):
        els = rtfx.extract_rtf(rtfx.make_rtf(paras, codepage=cp))
        assert [(e.kind, e.level, e.text) for e in els] == paras, cp


def test_reader_matches_golden(spark):
    from historicaldatadocumentparsersystem_spark import sources
    files = fixtures.rtf_file_rows(40)
    df = spark.createDataFrame(
        [(r["url"], r["payload"]) for r in files],
        "url string, payload binary").repartition(8)
    got = sorted(tuple(r) for r in sources.read_rtf_elements(df).collect())
    golden = sorted((r["url"], r["para"], r["kind"], r["level"], r["text"])
                    for r in pq.read_table(GOLDEN_RTF).to_pylist())
    assert got == golden
    flat = spark.createDataFrame(
        [(r["url"], r["payload"]) for r in files[:8]],
        "url string, payload binary")
    plan = (sources.read_rtf_elements(flat)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan      # map-only: parse shuffles nothing
