"""Legacy OLE2/CFB office family: container walk, [MS-PPT] /
[MS-DOC] text vectors, golden pin, Spark parity, core dispatch,
never-raise fuzz."""

import random

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import cfbx

GOLDEN = "fixtures/golden_cfb_seed42_n6.parquet"
COLS = ["pos", "row_kind", "path", "entry_kind", "size",
        "text_kind", "cp_start", "cp_end", "text"]


def _by_name():
    return {r["url"].rsplit("/", 1)[1]: r["payload"]
            for r in fixtures.cfb_file_rows()}


def test_container_walk():
    by = _by_name()
    d = cfbx.parse_cfb(by["deck.ppt"])
    assert d["version"] == 3 and d["sector_size"] == 512
    paths = [e[1] for e in d["entries"]]
    assert paths == ["PowerPoint Document", "Current User",
                     "Pictures", "Macros", "Macros/VBA_code",
                     "\x05SummaryInformation",
                     "\x05DocumentSummaryInformation"]
    # mini-stream member (< 4096) and FAT member (>= 4096) both read
    assert d["_streams"]["Macros/VBA_code"] == \
        b"Sub Noop()\nEnd Sub\n"
    assert d["_streams"]["Pictures"][:4] == b"\x89PNG"
    assert len(d["_streams"]["Pictures"]) == 5004
    # junk / truncated reject cleanly
    assert cfbx.parse_cfb(by["junk.bin"]) is None
    assert cfbx.parse_cfb(by["cut.ppt"]) is None
    assert cfbx.parse_cfb(None) is None


def test_ppt_text_atoms():
    by = _by_name()
    els = cfbx.extract_ppt_elements(by["deck.ppt"])
    assert [(k, t) for (_p, k, t) in els] == [
        ("chars", "Quarterly crawl report"),
        ("bytes", "Bullet one: coverage is up"),
        ("bytes", "Second slide text"),
        ("cstring", "https://example.org/link"),
        ("chars", "Résumé — unicode"),
    ]
    text, spans = cfbx.extract_ppt_text(by["deck.ppt"])
    # cstring excluded from the joined text; spans tile exactly
    assert "example.org/link" not in text
    assert text.startswith("Quarterly crawl report\nBullet")
    for (s, e, _k), part in zip(spans, text.split("\n")):
        assert text[s:e] == part
    # doc payloads yield no ppt rows
    assert cfbx.extract_ppt_elements(by["memo.doc"]) == []


def test_doc_piece_table():
    by = _by_name()
    pieces = cfbx.extract_doc_pieces(by["memo.doc"])
    assert [(c, t) for (_p, c, _a, _b, t) in pieces] == [
        (True, "Legacy Word text, part one. "),
        (False, "Part two — unicode é."),
    ]
    # CP ranges tile [0, ccpText)
    assert pieces[0][2:4] == (0, 28) and pieces[1][2:4] == (28, 49)
    text, spans = cfbx.extract_doc_text(by["memo.doc"])
    assert text == "Legacy Word text, part one. Part two — unicode é."
    assert spans == [(0, 28, "cp1252"), (28, 49, "utf16")]
    # 0Table flag routing + \r -> \n normalization in the join
    t0, s0 = cfbx.extract_doc_text(by["note.doc"])
    assert t0 == "Zero-table document body.\nSecond paragraph."
    assert s0 == [(0, 43, "cp1252")]
    # but the raw piece keeps the stream's \r
    raw = cfbx.extract_doc_pieces(by["note.doc"])[0][4]
    assert "\r" in raw
    assert cfbx.extract_doc_pieces(by["deck.ppt"]) == []


def test_core_dispatch_kinds():
    from historicaldatadocumentparsersystem_spark.extractor import core
    by = _by_name()
    r = core.extract_document(by["deck.ppt"], None)
    assert r.doc_kind == "ppt" and not r.failed
    assert r.extracted_text.startswith("Quarterly crawl report")
    r = core.extract_document(by["memo.doc"], "fb")
    assert r.doc_kind == "doc" and "unicode é." in r.extracted_text
    # other OLE: clean fallback, not a fail
    r = core.extract_document(by["thing.ole"], "fallback text")
    assert r.doc_kind == "empty" and not r.failed
    assert r.extracted_text == "fallback text"


def _pure() -> list[tuple]:
    out = []
    for r in fixtures.cfb_file_rows():
        url, blob = r["url"], r["payload"]
        d = cfbx.parse_cfb(blob)
        if d is None:
            continue
        for (pos, path, kind, size, _s) in d["entries"]:
            out.append((url, pos, "entry", path, kind, size,
                        None, None, None, None))
        for (pos, kind, text) in cfbx.extract_ppt_elements(blob):
            out.append((url, pos, "ppt_text", None, None, None,
                        kind, None, None, text))
        for (pos, comp, c0, c1, text) in \
                cfbx.extract_doc_pieces(blob):
            out.append((url, pos, "doc_piece", None, None, None,
                        "cp1252" if comp else "utf16", c0, c1,
                        text))
    return out


def test_match_committed_golden():
    got = [(r["url"],) + tuple(r[c] for c in COLS)
           for r in pq.read_table(GOLDEN).to_pylist()]
    assert got == _pure() and len(got) == 22


def test_spark_reader_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    df = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.cfb_file_rows()],
        "url string, payload binary").repartition(4)
    got = sorted(tuple(r) for r in
                 sources.read_legacy_office(df).collect())
    assert got == sorted(_pure())


def test_fuzz_never_raises():
    rng = random.Random(64)
    real = [r["payload"] for r in fixtures.cfb_file_rows()
            if len(r["payload"]) > 600]
    for _ in range(120):
        blob = (b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
                + bytes(rng.randrange(256)
                        for _ in range(rng.randrange(0, 1200))))
        d = cfbx.parse_cfb(blob)
        assert d is None or isinstance(d["entries"], list)
        assert isinstance(cfbx.extract_ppt_elements(blob), list)
        assert isinstance(cfbx.extract_doc_pieces(blob), list)
    for _ in range(60):
        base = bytearray(real[rng.randrange(len(real))])
        for _ in range(rng.randrange(1, 16)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        cut = bytes(base[:rng.randrange(0, len(base) + 1)])
        cfbx.parse_cfb(cut)
        cfbx.extract_ppt_elements(cut)
        cfbx.extract_doc_pieces(cut)


def test_degenerate_sibling_chain_keeps_all_entries():
    """Regression (r6, ADVICE r5): the directory walk counted LEFT/
    RIGHT sibling hops toward the 64 nesting cap, so a linked-list-
    shaped sibling chain — exactly what build_cfb emits — silently
    dropped entries (and their streams) past ~64 per storage."""
    from historicaldatadocumentparsersystem_spark.extractor import cfbx
    from historicaldatadocumentparsersystem_spark import fixtures
    blobs = [(f"S{i:03d}", f"payload {i}".encode()) for i in range(120)]
    doc = cfbx.parse_cfb(fixtures.build_cfb(blobs))
    names = [p for _, p, k, _, _ in doc["entries"] if k == "stream"]
    assert len(names) == 120, len(names)
    assert doc["_streams"]["S007"] == b"payload 7"
    assert doc["_streams"]["S119"] == b"payload 119"


def test_doc_with_embedded_ppt_object_extracts_word_text():
    """Regression (r6, ADVICE r5): is_ppt substring-probes the whole
    container, so a Word .doc carrying an embedded PowerPoint OLE
    object (the marker lives under ObjectPool/) dispatched as ppt,
    extracted nothing, and was marked a FAILED extraction instead of
    falling through to the fully-extractable Word piece table."""
    from historicaldatadocumentparsersystem_spark.extractor import cfbx, core
    from historicaldatadocumentparsersystem_spark import fixtures
    doc_payload = next(r["payload"] for r in fixtures.cfb_file_rows()
                       if r["url"].endswith("memo.doc"))
    d = cfbx.parse_cfb(doc_payload)
    entries = list(d["_streams"].items())
    entries.append(("ObjectPool/pptobj",
                    "PowerPoint Document".encode("utf-16-le")))
    blob = fixtures.build_cfb(entries)
    assert cfbx.is_ppt(blob) and cfbx.is_doc(blob)
    res = core.extract_document(blob, "fallback")
    assert not res.failed
    assert res.doc_kind == "doc"
    assert "Legacy Word text" in res.extracted_text
