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
