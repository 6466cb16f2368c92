"""Incremental near-dup detection against a persisted signature store.

The 100 TB dedup reality: a corpus is not deduplicated once — every new
crawl snapshot must be checked against EVERYTHING already ingested, and
re-minhashing petabytes per snapshot is a non-starter. The standard
answer (and this module) is an at-rest LSH index: MinHash signatures
are computed once per document and persisted as a band table; a new
batch hashes ONLY its own documents and equi-joins its band buckets
against the store.

At-rest layout (``minhash_band_table``): one row per (doc, band) with
the band's bucket hash and the full signature. Partition the parquet by
``band`` and bucket it by ``bucket`` at write time, and an incoming
batch's probe join is partition-pruned to same-band files and
bucket-co-located — no store-side shuffle, ever. The signature is
carried denormalized on each band row (parquet dictionary encoding
makes the repeat cheap) so the verify step needs no second join back
to a signature table.

Cost model per new batch of size B against a store of size S:
hash O(B), join O(B + matching-bucket rows) — never O(S). The
store-vs-store pair set is never recomputed (it was emitted when those
docs were themselves the new batch).

Hash family and semantics are EXACTLY ``dedup.minhash_lsh_pairs``
(same shingles, portable md5-min signature, band bucket md5, estimated
Jaccard = agreeing-position fraction): incremental ingestion of the
same corpus yields the identical pair set, pytest-pinned in
tests/test_operators.py::test_incremental_matches_full_recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import minhash_signature, shingles

BAND_COLS = ("id", "band", "bucket", "sig")


def minhash_band_table(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_hashes: int = 16,
                       bands: int = 8, n: int = 2) -> DataFrame:
    """(id, band, bucket, sig) — the at-rest LSH index rows for one
    batch. Empty-shingle docs (shorter than one n-gram) are excluded,
    as in ``minhash_lsh_pairs``."""
    rows_per_band = num_hashes // bands
    shingled = (df.select(F.col(id_col).alias("id"),
                          shingles(text_col, n).alias("sh"))
                .where(F.size("sh") > 0))
    sig = shingled.select(
        "id", minhash_signature("sh", num_hashes).alias("sig"))
    return sig.select(
        "id", "sig",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band")
    ).select(
        "id", F.col("band").cast("int").alias("band"),
        F.md5(F.concat_ws(
            "|", F.expr(f"slice(sig, band * {rows_per_band} + 1, "
                        f"{rows_per_band})"))).alias("bucket"),
        "sig")


def incremental_minhash_pairs(new_docs: DataFrame, store: DataFrame,
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              num_hashes: int = 16, bands: int = 8,
                              n: int = 2, threshold: float = 0.5
                              ) -> tuple[DataFrame, DataFrame]:
    """Near-dup pairs touching the NEW batch: store-vs-new plus
    new-vs-new, verified by estimated Jaccard >= threshold. Returns
    ``(pairs, new_band_rows)``; the caller appends ``new_band_rows``
    to the store (plain parquet append into the band partitions — no
    rewrite, no read-modify-write).

    Requires ids to be globally unique and new ids ordered after store
    ids is NOT required: candidate orientation is (lower id, higher
    id), matching a one-shot full run regardless of arrival order.
    The probe join is a hash equi-join on (band, bucket) with the new
    side as the small build side — broadcastable per batch.
    """
    new_b = minhash_band_table(new_docs, text_col, id_col,
                               num_hashes, bands, n).persist()
    all_b = store.select(*BAND_COLS).unionByName(new_b.select(*BAND_COLS))
    cand = (all_b.alias("a")
            .join(new_b.alias("b"),
                  (F.col("a.band") == F.col("b.band"))
                  & (F.col("a.bucket") == F.col("b.bucket"))
                  & (F.col("a.id") != F.col("b.id")))
            .select(F.least("a.id", "b.id").alias("id_a"),
                    F.greatest("a.id", "b.id").alias("id_b"),
                    F.when(F.col("a.id") < F.col("b.id"),
                           F.col("a.sig")).otherwise(F.col("b.sig"))
                    .alias("sig_a"),
                    F.when(F.col("a.id") < F.col("b.id"),
                           F.col("b.sig")).otherwise(F.col("a.sig"))
                    .alias("sig_b"))
            .dropDuplicates(["id_a", "id_b"]))
    est = (F.size(F.filter(F.zip_with("sig_a", "sig_b",
                                      lambda x, y: x == y),
                           lambda eq: eq))
           / F.size(F.col("sig_a")))
    pairs = (cand
             .withColumn("est_jaccard", F.round(est, 6))
             .where(F.col("est_jaccard") >= threshold)
             .select("id_a", "id_b", "est_jaccard"))
    return pairs, new_b
