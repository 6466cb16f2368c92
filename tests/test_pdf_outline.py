"""PDF document outline (bookmarks): extractor/pdfx.py tree walk
(golden-pinned), the fixture encode half, and the Spark reader."""

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import pdfx

GOLDEN_PDF_OUTLINE = "fixtures/golden_pdf_outline_seed42_n30.parquet"


def _pure_rows(n: int) -> list[tuple]:
    out = []
    for r in fixtures.pdf_outline_rows(n):
        for row in pdfx.extract_pdf_outline(r["payload"]):
            out.append((r["url"], *row))
    return out


def test_outline_matches_committed_golden():
    golden = [(r["url"], r["pos"], r["depth"], r["title"])
              for r in pq.read_table(GOLDEN_PDF_OUTLINE).to_pylist()]
    assert golden == _pure_rows(30)
    assert len(golden) == 65


def test_preorder_nesting_and_titles():
    ol = [(1, "A"), (2, "A.1"), (3, "A.1.a"), (2, "A.2"),
          (1, "B — ünï"), (2, "B (x) \\ y")]
    pdf = fixtures._make_pdf([["body"]], outline=ol)
    got = pdfx.extract_pdf_outline(pdf)
    assert got == [(i, d, t) for i, (d, t) in enumerate(ol)]
    # the content pass is undisturbed by the appended tree
    from historicaldatadocumentparsersystem_spark.extractor import core
    assert core.extract_document(pdf, None).doc_kind == "pdf"
    # no outline / empty outline / non-pdf -> zero rows
    assert pdfx.extract_pdf_outline(fixtures._make_pdf([["x"]])) == []
    assert pdfx.extract_pdf_outline(
        fixtures._make_pdf([["x"]], outline=[])) == []
    assert pdfx.extract_pdf_outline(b"not a pdf") == []


def test_cycle_guard_and_malformed():
    # hand-built cycle: item 3 -> Next -> itself
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Outlines 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Outlines /First 3 0 R >>\nendobj\n"
           b"3 0 obj\n<< /Title (loop) /Next 3 0 R >>\nendobj\n"
           b"trailer\n<< /Root 1 0 R >>\n%%EOF")
    assert pdfx.extract_pdf_outline(pdf) == [(0, 1, "loop")]
    # dangling child ref degrades to the parsed prefix
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Outlines 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Outlines /First 9 0 R >>\nendobj\n"
           b"trailer\n<< /Root 1 0 R >>\n%%EOF")
    assert pdfx.extract_pdf_outline(pdf) == []
    import random
    rng = random.Random("pdfol-fuzz")
    for _ in range(150):
        body = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(400)))
        pdfx.extract_pdf_outline(b"%PDF-1.4\n" + body)


def test_reader_matches_golden(spark):
    from historicaldatadocumentparsersystem_spark import sources
    files = fixtures.pdf_outline_rows(30)
    df = spark.createDataFrame(
        [(r["url"], r["payload"]) for r in files],
        "url string, payload binary").repartition(8)
    got = sorted(tuple(r)
                 for r in sources.read_pdf_outline(df).collect())
    golden = sorted((r["url"], r["pos"], r["depth"], r["title"])
                    for r in pq.read_table(GOLDEN_PDF_OUTLINE)
                    .to_pylist())
    assert got == golden
    flat = spark.createDataFrame(
        [(r["url"], r["payload"]) for r in files[:5]],
        "url string, payload binary")
    plan = (sources.read_pdf_outline(flat)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
