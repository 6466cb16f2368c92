"""Modern PDFs (PDF 1.5+ object streams + cross-reference streams):
expand_object_streams / _iter_trailer_dicts in extractor/pdfx.py and
the classic==modern extraction parity."""

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import pdfx

GOLDEN = "fixtures/golden_pdf_modern_seed42_n40.parquet"


def test_modern_matches_committed_golden():
    golden = [tuple(r[c] for c in ("url", *pdfx.INFO_FIELDS))
              for r in pq.read_table(GOLDEN).to_pylist()]
    pure = []
    for r in fixtures.pdf_modern_rows(40):
        info = pdfx.extract_pdf_info(r["payload"])
        if info is not None:
            pure.append((r["url"],
                         *(info[f] for f in pdfx.INFO_FIELDS)))
    assert golden == pure
    assert len(golden) == 26          # no-Info + junk rows yield none


def test_classic_modern_parity_info_outline_text():
    pages = [["alpha beta gamma", "delta"], ["zeta eta theta"]]
    info = {"Title": "Tïtle — modern", "Author": "A. Writer",
            "CreationDate": "D:20240102030405Z"}
    outline = [(1, "Intro"), (2, "Intro.A"), (2, "Intro.B"),
               (1, "End")]
    classic = fixtures._make_pdf(pages, info=info, outline=outline)
    modern = fixtures._make_pdf_modern(pages, info=info,
                                       outline=outline)
    assert pdfx.extract_pdf_info(classic) \
        == pdfx.extract_pdf_info(modern)
    assert pdfx.extract_pdf_outline(classic) \
        == pdfx.extract_pdf_outline(modern)
    assert pdfx.extract_pdf(classic)[0] == pdfx.extract_pdf(modern)[0]
    # the modern file really is modern
    assert b"/Type /ObjStm" in modern and b"/Type /XRef" in modern \
        and b"trailer" not in modern


def test_expand_is_identity_on_classic():
    classic = fixtures._make_pdf([["x y z"]], info={"Title": "t"})
    assert pdfx.expand_object_streams(classic) is classic


def test_modern_never_raises_on_fuzz():
    import random
    rng = random.Random("pdfmodern-fuzz")
    good = fixtures._make_pdf_modern([["a b"]], info={"Title": "t"},
                                     outline=[(1, "x")])
    blobs = [good[:i] for i in range(0, len(good), 11)]
    blobs += [good.replace(b"/First", b"/Fxrst"),
              good.replace(b"/N 5", b"/N 9999")]
    for _ in range(120):
        blobs.append(b"%PDF-1.5" + bytes(
            rng.randrange(256) for _ in range(rng.randrange(300))))
    for blob in blobs:
        pdfx.extract_pdf_info(blob)
        pdfx.extract_pdf_outline(blob)
        pdfx.extract_pdf(blob)


def test_spark_source_reads_modern(spark):
    files = fixtures.pdf_modern_rows(40)
    from historicaldatadocumentparsersystem_spark import sources
    df = spark.createDataFrame(
        [(r["url"], r["payload"]) for r in files],
        "url string, payload binary")
    got = sorted(tuple(r) for r in sources.read_pdf_info(df).collect())
    golden = sorted(tuple(r[c] for c in ("url", *pdfx.INFO_FIELDS))
                    for r in pq.read_table(GOLDEN).to_pylist())
    assert got == golden


def test_real_world_xref_dict_syntax():
    """The fixture xref dict carries /ID [<hex> <hex>] and a nested
    /DecodeParms << ... >> — the forms every real producer emits and
    the simple content-stream regex cannot parse."""
    modern = fixtures._make_pdf_modern([["x y"]], info={"Title": "t"})
    assert b"/ID [<" in modern and b"/DecodeParms <<" in modern
    assert pdfx.extract_pdf_info(modern)["title"] == "t"


def test_incremental_update_beats_objstm_copy():
    """expand_object_streams inserts IN PLACE: a classic
    redefinition APPENDED after the ObjStm (an incremental update)
    must win at the last-match readers."""
    modern = fixtures._make_pdf_modern([["x y"]],
                                       info={"Title": "old"})
    # find the info object number from the xref dict
    import re
    m = re.search(rb"/Info (\d+) 0 R", modern)
    num = int(m.group(1))
    updated = modern + (b"\n%d 0 obj << /Title (new) >> endobj\n"
                        % num)
    assert pdfx.extract_pdf_info(updated)["title"] == "new"


def test_wide_xref_offsets_past_64k():
    """/W offset field widens with file size (a 2-byte field would
    overflow past 65535 bytes)."""
    pages = [[f"line {i} with some filler words here"
              for i in range(60)] for _ in range(40)]
    big = fixtures._make_pdf_modern(pages, info={"Title": "big"})
    assert len(big) > 65536
    assert pdfx.extract_pdf_info(big)["title"] == "big"
