"""Golden-fixture regression (SURVEY.md §5.2 item 2): the committed
expected output pins the extractor's semantics — any change to
classification/scoring/span logic must consciously regenerate it."""

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark.extractor import extract_document
from historicaldatadocumentparsersystem_spark.fixtures import generate_rows

GOLDEN = "fixtures/golden_extracted_seed42_n300.parquet"


def test_oracle_matches_committed_golden():
    golden = {r["url"]: r for r in pq.read_table(GOLDEN).to_pylist()}
    rows = generate_rows(300)
    assert len(golden) == 300
    for row in rows:
        res = extract_document(row["html"], row["text"])
        g = golden[row["url"]]
        assert res.doc_kind == g["doc_kind"], row["url"]
        assert res.title == g["title"], row["url"]
        assert res.extracted_text == g["extracted_text"], row["url"]
        assert res.spans_as_dicts() == g["spans"], row["url"]
        assert res.n_blocks == g["n_blocks"]
        assert res.score == g["score"]
        assert res.failed == g["failed"]


def test_oracle_matches_scale8_golden():
    """Big-page (~12 KB) semantics pinned separately — the bench corpus
    band, where candidate scoring and pruning paths differ from 2 KB."""
    golden = {r["url"]: r for r in pq.read_table(
        "fixtures/golden_extracted_seed42_n100_scale8.parquet").to_pylist()}
    for row in generate_rows(100, scale=8):
        res = extract_document(row["html"], row["text"])
        g = golden[row["url"]]
        assert res.extracted_text == g["extracted_text"], row["url"]
        assert res.spans_as_dicts() == g["spans"]
        assert (res.doc_kind, res.title, res.n_blocks, res.score,
                res.failed) == (g["doc_kind"], g["title"], g["n_blocks"],
                                g["score"], g["failed"])
