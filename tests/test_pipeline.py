

def test_compact_extracted_preserves_rows_and_reduces_files(spark, tmp_path):
    """Small-files compaction: many tiny files per part_id collapse
    to one file per partition, rows and resume state unchanged."""
    from historicaldatadocumentparsersystem_spark import fixtures, pipeline
    from historicaldatadocumentparsersystem_spark.catalog import Catalog
    out = str(tmp_path / "tbl")
    docs = fixtures.corpus_df(spark, 120, num_partitions=8)
    pipeline.run_extraction(spark, docs, out, run_id="r",
                            snapshot_id="s1", num_buckets=4)
    cat = Catalog(out)
    before_rows = sorted(
        (r["url"], r["doc_kind"])
        for r in cat.read_extracted(spark).collect())
    n_before = len(cat.data_files())
    assert n_before > 4          # multiple files per partition exist
    res = cat.compact_extracted(spark, target_rows_per_file=10_000)
    assert res["files_before"] == n_before
    assert res["files_after"] == 4          # one file per part_id
    assert res["rows"] == len(before_rows)
    after_rows = sorted(
        (r["url"], r["doc_kind"])
        for r in cat.read_extracted(spark).collect())
    assert after_rows == before_rows
    # physical-only: lineage/resume is untouched
    assert cat.done_partitions(spark, "s1") == set(range(4))
    # second run over the compacted table still resumes cleanly
    r2 = pipeline.run_extraction(spark, docs, out, run_id="r",
                                 snapshot_id="s1", num_buckets=4)
    assert r2["skipped_partitions"] == 4
