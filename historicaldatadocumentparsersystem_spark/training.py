"""Training-data preparation: the composed end-to-end pipeline.

Chains the engine's stages into the job a 100 TB training-data run
actually executes:

    documents ──extract──▶ main text (+title/spans/score)
              ──soft404──▶ drop error-shell pages (phrase + brevity)
              ──quality──▶ keep documents passing heuristic gates
                           (+ Gopher repetition gate)
              ──redact───▶ PII scrub (email/IP/phone spans)
              ──dedup────▶ one canonical row per distinct text
              ──cap──────▶ at most N docs per host (hot-domain cap)
              ──split────▶ leakage-safe train/val/test assignment
              ──chunk────▶ token-budget chunks for the tokenizer

Plan shape: the extraction shuffle (url-hash) is the first exchange;
quality filtering + PII redaction are codegen'd exprs fused onto the
UDF output; the dedup is one hash-shuffle on md5(text) (16-byte keys,
map-side partial agg); the host cap is one window on host; the split
is a pure scalar; chunking reuses the url partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import functions as fn
from . import pipeline
from .operators import chunking, skew, textstats


def quality_gate(extracted: DataFrame, min_quality: float = 0.5,
                 min_chars: int = 80) -> DataFrame:
    """Heuristic quality filter over extracted rows (gopher-style),
    fused with the soft-404 error-shell AND the consent/paywall
    interstitial gates — all pure column predicates on one codegen
    stage, no extra exchange."""
    from .operators.webtext import interstitial_keep, soft404_keep
    return (extracted
            .where(F.col("failed") == 0)
            .where(soft404_keep("extracted_text"))
            .where(interstitial_keep("extracted_text"))
            .where(F.length("extracted_text") >= min_chars)
            .where(textstats.quality_score("extracted_text")
                   >= min_quality))


def repetition_gate(extracted: DataFrame, max_dup_word: float = 0.9,
                    max_top_bigram: float = 0.30) -> DataFrame:
    """Gopher repetition rules over extracted text: drop documents
    whose duplicate-word ratio or top-bigram fraction betrays
    boilerplate/spam. Join-free for the dup-word rule (pure expr); the
    bigram rule joins the per-doc mode computed by
    ``textstats.repetition_profile``."""
    rep = textstats.repetition_profile(
        extracted, text_col="extracted_text", id_col="url")
    keep = rep.where((F.col("dup_word_ratio") <= max_dup_word)
                     & (F.col("top_bigram_ratio") <= max_top_bigram)) \
        .select("url")
    return extracted.join(keep, "url", "left_semi")


def dedup_extracted(extracted: DataFrame) -> DataFrame:
    """Exact dedup on extracted text: canonical row = smallest url per
    md5 of the NFC-CANONICAL text (deterministic on any cluster
    size). Key-side canonicalization only — document bytes are left
    untouched, but U+00E9 and e+U+0301 copies collapse to one row
    (un-normalized corpora leak visually-exact duplicates through a
    raw byte hash; see operators/encoding.nfc_key)."""
    from .operators.encoding import nfc_key
    w = Window.partitionBy(
        F.md5(nfc_key("extracted_text"))).orderBy("url")
    return (extracted.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn"))


def chunks_from_extracted(extracted: DataFrame, max_tokens: int = 256,
                          overlap: int = 32) -> DataFrame:
    """Split kept documents into token-budget chunks (A4): extracted
    blocks (the "\\n"-joined spans) become elements in reading order."""
    elements = (extracted
                .select("url", F.posexplode(
                    F.split("extracted_text", "\n")).alias("pos", "text"))
                .where(F.col("text") != "")
                .withColumn("page", F.lit(0)))
    return chunking.chunk_by_token_budget(elements, max_tokens, overlap)


def prepare_training_data(spark: SparkSession, docs: DataFrame,
                          out_dir: str, run_id: str,
                          min_quality: float = 0.5,
                          max_tokens: int = 256, overlap: int = 32,
                          num_buckets: int = 64,
                          max_per_host: int = 10_000) -> dict:
    """Full pipeline; writes kept docs + chunks, returns stage counts."""
    extracted = pipeline.extract_df(docs, num_buckets=num_buckets)
    extracted.write.mode("overwrite").parquet(f"{out_dir}/extracted")
    extracted = spark.read.parquet(f"{out_dir}/extracted")

    kept = repetition_gate(
        quality_gate(extracted, min_quality=min_quality))
    kept = kept.withColumn("extracted_text",
                           fn.redact_pii("extracted_text"))
    unique = skew.cap_per_host(dedup_extracted(kept),
                               cap=max_per_host).drop("rk")
    unique = unique.withColumn("split", fn.hash_split("url"))
    unique.write.mode("overwrite").parquet(f"{out_dir}/documents_clean")
    unique = spark.read.parquet(f"{out_dir}/documents_clean")

    chunks = chunks_from_extracted(unique, max_tokens, overlap) \
        .join(unique.select("url", "split"), "url")
    chunks.write.mode("overwrite").parquet(f"{out_dir}/chunks")

    stats = {
        "run_id": run_id,
        "n_input": docs.count(),
        "n_extracted": extracted.count(),
        "n_quality_kept": kept.count(),
        "n_unique": unique.count(),
        "n_chunks": spark.read.parquet(f"{out_dir}/chunks").count(),
    }
    return stats


def export_training_data(spark: SparkSession, out_dir: str,
                         docs_per_shard: int = 100_000) -> dict:
    """Handoff stage after ``prepare_training_data``: export the
    cleaned documents as deterministic JSONL shards plus the dataset
    card — the two artifacts the tokenizer/training stack consumes
    (``sinks.write_jsonl_shards`` / ``write_dataset_card``). Returns
    {"manifest": ..., "card": ...}.
    """
    from . import sinks

    unique = (spark.read.parquet(f"{out_dir}/documents_clean")
              .select(F.col("url").alias("doc_id"),
                      F.col("extracted_text").alias("text"),
                      F.col("split").alias("lang_or_split")))
    # the card groups by split here (the clean table carries no lang
    # column); callers with language labels pass their own frame
    manifest = sinks.write_jsonl_shards(
        unique.withColumnRenamed("lang_or_split", "split"),
        f"{out_dir}/export", id_col="doc_id",
        docs_per_shard=docs_per_shard)
    card = sinks.write_dataset_card(
        unique, f"{out_dir}/export", text_col="text",
        lang_col="lang_or_split")
    return {"manifest": manifest, "card": card}
