"""Office-container metadata (extractor/officemeta +
sources.read_office_meta): per-format parts, entity/whitespace
handling, golden re-derivation, Spark == pure.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from historicaldatadocumentparsersystem_spark import fixtures, sources  # noqa: E402
from historicaldatadocumentparsersystem_spark.extractor import (  # noqa: E402
    docx, odtx, officemeta, pptx)

GOLDEN = "fixtures/golden_officemeta_seed42.parquet"


def test_docx_core_properties_round_trip():
    core = officemeta.build_core_properties({
        "title": "T & <x>", "creator": "A", "keywords": "k1, k2",
        "created": "2024-01-15T08:30:00Z", "subject": None})
    d = docx.make_docx([("text", "body")],
                       extra_parts={"docProps/core.xml": core})
    meta = officemeta.extract_office_meta(d)
    assert meta["format"] == "docx"
    assert meta["title"] == "T & <x>"
    assert meta["keywords"] == "k1, k2"
    assert meta["created"] == "2024-01-15T08:30:00Z"
    assert meta["subject"] is None and meta["modified"] is None


def test_pptx_core_properties():
    core = officemeta.build_core_properties({"title": "Deck",
                                             "creator": "B"})
    p = pptx.make_pptx([{"title": "s", "paras": [("x", False)]}],
                       extra_parts={"docProps/core.xml": core})
    meta = officemeta.extract_office_meta(p)
    assert meta["format"] == "pptx" and meta["title"] == "Deck"


def test_odt_meta_keyword_join_and_creator_precedence():
    m = officemeta.build_odf_meta({
        "title": "Odt T", "creator": "Initial C",
        "keywords": ["k1", "k2"], "created": "2023-02-01T00:00:00Z",
        "modified": "2023-03-01T00:00:00Z"})
    d = odtx.make_odt([("text", "body")], extra_parts={"meta.xml": m})
    meta = officemeta.extract_office_meta(d)
    assert meta["format"] == "odt"
    assert meta["creator"] == "Initial C"     # meta:initial-creator
    assert meta["keywords"] == "k1, k2"
    assert meta["created"] == "2023-02-01T00:00:00Z"
    assert meta["modified"] == "2023-03-01T00:00:00Z"


def test_epub_opf_dc_block():
    book = fixtures.epub_file_rows(1)[0]
    meta = officemeta.extract_office_meta(book["payload"])
    assert meta is not None and meta["format"] == "epub"
    assert meta["title"]


def test_no_metadata_part_returns_none():
    assert officemeta.extract_office_meta(
        docx.make_docx([("text", "x")])) is None
    assert officemeta.extract_office_meta(b"not a zip") is None
    assert officemeta.extract_office_meta(None) is None
    assert officemeta.extract_office_meta(b"") is None


def test_golden_rederivation():
    import pyarrow.parquet as pq
    golden = pq.read_table(GOLDEN).to_pylist()
    derived = []
    sets = (fixtures.docx_file_rows(40) + fixtures.pptx_deck_rows(40)
            + fixtures.odt_file_rows(40) + fixtures.epub_file_rows(30))
    for r in sets:
        meta = officemeta.extract_office_meta(r["payload"])
        if meta is None:
            continue
        derived.append({"url": r["url"], "format": meta["format"],
                        **{f: meta[f]
                           for f in officemeta.META_FIELDS}})
    assert golden == derived


@pytest.mark.usefixtures("spark")
def test_spark_source_matches_pure(spark):
    rows = fixtures.docx_file_rows(10) + fixtures.odt_file_rows(10)
    df = spark.createDataFrame(
        [(r["url"], r["payload"]) for r in rows],
        "url string, payload binary").repartition(4)
    got = sorted((r.url, r.format, r.title, r.keywords)
                 for r in sources.read_office_meta(df).collect())
    want = []
    for r in rows:
        meta = officemeta.extract_office_meta(r["payload"])
        if meta is not None:
            want.append((r["url"], meta["format"], meta["title"],
                         meta["keywords"]))
    assert got == sorted(want)
