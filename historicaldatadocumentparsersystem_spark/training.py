"""Training-data preparation: the composed end-to-end pipeline.

Chains the engine's stages into the job a 100 TB training-data run
actually executes:

    documents ──extract──▶ main text (+title/spans/score)
              ──quality──▶ keep documents passing heuristic gates
              ──dedup────▶ one canonical row per distinct text
              ──chunk────▶ token-budget chunks for the tokenizer

Plan shape: the extraction shuffle (url-hash) is the first exchange;
quality filtering is a codegen'd filter fused onto the UDF output; the
dedup is one hash-shuffle on md5(text) (16-byte keys, map-side partial
agg); chunking reuses the url partitioning. Four stages, three
exchanges, all keys uniform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import pipeline
from .operators import chunking, textstats


def quality_gate(extracted: DataFrame, min_quality: float = 0.5,
                 min_chars: int = 80) -> DataFrame:
    """Heuristic quality filter over extracted rows (gopher-style)."""
    return (extracted
            .where(F.col("failed") == 0)
            .where(F.length("extracted_text") >= min_chars)
            .where(textstats.quality_score("extracted_text")
                   >= min_quality))


def dedup_extracted(extracted: DataFrame) -> DataFrame:
    """Exact dedup on extracted text: canonical row = smallest url per
    md5(extracted_text) (deterministic on any cluster size)."""
    w = Window.partitionBy(F.md5("extracted_text")).orderBy("url")
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
                          num_buckets: int = 64) -> dict:
    """Full pipeline; writes kept docs + chunks, returns stage counts."""
    extracted = pipeline.extract_df(docs, num_buckets=num_buckets)
    extracted.write.mode("overwrite").parquet(f"{out_dir}/extracted")
    extracted = spark.read.parquet(f"{out_dir}/extracted")

    kept = quality_gate(extracted, min_quality=min_quality)
    unique = dedup_extracted(kept)
    unique.write.mode("overwrite").parquet(f"{out_dir}/documents_clean")
    unique = spark.read.parquet(f"{out_dir}/documents_clean")

    chunks = chunks_from_extracted(unique, max_tokens, overlap)
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
