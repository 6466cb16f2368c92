"""PDF document-information dictionary (extractor/pdfx.extract_pdf_info
+ sources.read_pdf_info): string forms, date parsing, incremental
updates, golden re-derivation, Spark == pure.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from historicaldatadocumentparsersystem_spark import fixtures, sources  # noqa: E402
from historicaldatadocumentparsersystem_spark.extractor import pdfx  # noqa: E402
from historicaldatadocumentparsersystem_spark.fixtures import _make_pdf  # noqa: E402

GOLDEN = "fixtures/golden_pdfinfo_seed42_n300.parquet"


def test_info_fields_and_escapes():
    pdf = _make_pdf([["hello"]], info={
        "Title": "Par(en)s \\ back",
        "Author": "A. Writer",
        "CreationDate": "D:20240115103000+02'00'",
    })
    info = pdfx.extract_pdf_info(pdf)
    assert info["title"] == "Par(en)s \\ back"
    assert info["author"] == "A. Writer"
    assert info["creation_date"] == "2024-01-15T10:30:00+02:00"
    assert info["producer"] is None


def test_utf16be_hex_string_title():
    pdf = _make_pdf([["x"]], info={"Title": "Résumé — naïve"})
    assert pdfx.extract_pdf_info(pdf)["title"] == "Résumé — naïve"


def test_no_info_returns_none():
    assert pdfx.extract_pdf_info(_make_pdf([["x"]])) is None
    assert pdfx.extract_pdf_info(b"") is None
    assert pdfx.extract_pdf_info(b"not a pdf") is None


def test_incremental_update_last_trailer_wins():
    base = _make_pdf([["x"]], info={"Title": "old title"})
    # appended incremental update: a NEW info object + a new trailer
    n = base.count(b" 0 obj") + 1
    update = (f"{n} 0 obj\n<< /Title (new title) >>\nendobj\n"
              f"trailer\n<< /Size {n + 1} /Root 1 0 R /Info {n} 0 R >>\n"
              "startxref\n0\n%%EOF\n").encode()
    info = pdfx.extract_pdf_info(base + update)
    assert info["title"] == "new title"


def test_date_edge_forms():
    assert pdfx.pdf_date_to_iso("D:20240229") == "2024-02-29T00:00:00"
    assert pdfx.pdf_date_to_iso("D:2024011510") == "2024-01-15T10:00:00"
    assert pdfx.pdf_date_to_iso("D:20240115103000Z") \
        == "2024-01-15T10:30:00+00:00"
    assert pdfx.pdf_date_to_iso("D:20240115103000-05'30'") \
        == "2024-01-15T10:30:00-05:30"
    assert pdfx.pdf_date_to_iso("garbage") is None
    assert pdfx.pdf_date_to_iso(None) is None


def test_golden_rederivation():
    import pyarrow.parquet as pq
    golden = pq.read_table(GOLDEN).to_pylist()
    derived = []
    for i in range(300):
        if fixtures.row_class(i) != "pdf":
            continue
        r = fixtures.make_row(i)
        info = pdfx.extract_pdf_info(r["html"])
        if info is None:
            continue
        derived.append({"url": r["url"],
                        **{f: info[f] for f in pdfx.INFO_FIELDS}})
    assert golden == derived


@pytest.mark.usefixtures("spark")
def test_spark_source_matches_pure(spark):
    rows = [fixtures.make_row(i) for i in range(100)]
    df = spark.createDataFrame(
        [(r["url"], r["html"]) for r in rows],
        "url string, payload binary").repartition(4)
    got = sorted((r.url, r.title, r.creation_date)
                 for r in sources.read_pdf_info(df).collect())
    want = []
    for r in rows:
        try:
            info = pdfx.extract_pdf_info(r["html"] or b"")
        except Exception:
            continue
        if info is not None:
            want.append((r["url"], info["title"], info["creation_date"]))
    assert got == sorted(want)


def test_nonoctal_digit_escape_is_literal():
    # PDF: a backslash before a non-octal digit just drops the
    # backslash — \8 is '8', never an int('8', 8) crash (review fix).
    # The fixture builder escapes backslashes correctly, so the raw
    # token decoder is exercised directly.
    assert pdfx._pdf_text(rb"(a\8b \9 \123 \77)") == "a8b 9 S ?"
    # and a malicious /Info literal with \8 must not raise end-to-end
    base = _make_pdf([["x"]], info={"Title": "placeholder"})
    spliced = base.replace(b"(placeholder)", rb"(bad\8esc)")
    assert pdfx.extract_pdf_info(spliced)["title"] == "bad8esc"


def test_trailer_with_id_hex_strings_still_resolves_info():
    # nearly every real producer writes /ID [<hex> <hex>] in the
    # trailer; the lone '>' closers must not stop the trailer scan
    base = _make_pdf([["x"]], info={"Title": "has id"})
    spliced = base.replace(
        b"trailer\n<< /Size",
        b"trailer\n<< /ID [<31415926535897> <31415926535897>] /Size")
    assert b"/ID [<" in spliced
    assert pdfx.extract_pdf_info(spliced)["title"] == "has id"
