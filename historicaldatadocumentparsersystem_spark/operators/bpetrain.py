"""Distributed BPE merge learning (Sennrich et al. 2016 Alg. 1).

The tokenizer story's training half (extractor/bpe.py is inference;
its ``learn_merges`` is this module's pure oracle). The scale shape is
the one industrial BPE trainers use:

- ONE corpus pass aggregates (word, freq) — the only stage that
  touches payload-sized data, a single explode + map-side-combinable
  groupBy shuffle;
- the learning loop then runs over the VOCAB table (|distinct words|,
  orders of magnitude smaller than the corpus). Each iteration is a
  pair-count groupBy + a 1-ROW argmax collect (the k-means
  "MLlib pattern" — the merge decision is k×1, not data-sized) + a
  map-only merge application, with a localCheckpoint on the vocab
  carrier so plan size stays bounded in the iteration count (the
  host_hits lesson).

The merge application is PURE JVM STRING WORK, no Python and no
array fold: each word's symbol sequence is encoded as
``\\x1f<sym>\\x1e`` units, and applying merge (a, b) is
``replace(enc, '\\x1fa\\x1e\\x1fb\\x1e', '\\x1fab\\x1e')`` — string
replace is left-to-right and non-overlapping, which IS the training
pass's greedy semantics (a merge result never becomes the LEFT side
of another match in the same pass). The same encoding makes the
DuckDB twin a literal transcription (chained CTEs, one per merge).

Words are restricted to printable ASCII (``^[ -~]+$``) so the
delimiter bytes can never occur inside a symbol; the pre-tokenizer
uses an explicit whitespace class (no ``\\s`` — the Java-vs-RE2
divergence) shared with the oracle SQL.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_US = "\x1f"   # unit separator: opens a symbol
_RS = "\x1e"   # record separator: closes a symbol
_EOW = "</w>"

# lowercase word / digit run / single punct — extractor/bpe._PRETOK
# with the whitespace class spelled out (RE2-safe, Java-identical)
PRETOK_RE = r"[a-z]+|[0-9]+|[^a-z0-9 \t\n\r\f\x0b]"
# public: the oracle SQL generator interpolates this (never retyped)
PRINTABLE_RE = "^[ -~]+$"
_PRINTABLE_RE = PRINTABLE_RE


def word_freq_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus: ONE explode + ONE combinable
    groupBy — the only corpus-sized stage of BPE training."""
    word = F.explode(F.expr(
        f"regexp_extract_all(lower({text_col}), '{PRETOK_RE}', 0)"))
    return (df.select(word.alias("word"))
            .where(F.col("word").rlike(_PRINTABLE_RE))
            .groupBy("word")
            .agg(F.count("*").cast("long").alias("freq")))


def _encode(word_col) -> "F.Column":
    """word -> the delimited symbol string: one \\x1f<char>\\x1e unit
    per character plus the end-of-word marker unit."""
    per_char = F.expr(
        "array_join(transform(sequence(1, length(word)), "
        f"i -> concat('{_US}', substring(word, i, 1), '{_RS}')), '')")
    return F.concat(per_char, F.lit(_US + _EOW + _RS))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-pair totals over the encoded vocab."""
    ls = F.split(F.expr("substring(enc, 2, length(enc) - 2)"),
                 _RS + _US)
    pairs = F.expr(
        "transform(sequence(1, size(ls) - 1), "
        "i -> struct(element_at(ls, i) AS a, element_at(ls, i + 1) AS b))")
    return (vocab.select(ls.alias("ls"), "freq")
            # fully-merged words (one symbol) contribute no pairs; the
            # guard also keeps sequence() ascending — Spark's
            # sequence(1, 0) is DESCENDING [1, 0] and element_at(ls, 2)
            # would throw under ANSI
            .where(F.expr("size(ls) >= 2"))
            .select(F.explode(pairs).alias("p"), "freq")
            .select("p.a", "p.b", "freq")
            .groupBy("a", "b")
            .agg(F.sum("freq").cast("long").alias("cnt")))


def learn_bpe_merges(df: DataFrame, text_col: str = "text",
                     n_merges: int = 16) -> DataFrame:
    """Learn ``n_merges`` BPE merges from a corpus; returns a
    DataFrame (merge_rank int, left_sym string, right_sym string) in
    learning order. Deterministic: ties break on (count desc, left
    asc, right asc), binary string order both engines (symbols are
    printable ASCII by construction). Stops early when no adjacent
    pair remains."""
    spark = df.sparkSession
    wf = word_freq_table(df, text_col)
    vocab = (wf.select(_encode(F.col("word")).alias("enc"), "freq")
             .localCheckpoint())
    merges: list[tuple[int, str, str]] = []
    for rank in range(n_merges):
        top = (_pair_counts(vocab)
               .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
               .limit(1).collect())
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((rank, a, b))
        pat = _US + a + _RS + _US + b + _RS
        rep = _US + a + b + _RS
        # F.replace keeps the pair OUT of SQL-string escaping (symbols
        # may contain quotes); localCheckpoint bounds the plan per
        # iteration (persist alone re-nests the previous DAG)
        vocab = (vocab.select(
                     F.replace(F.col("enc"), F.lit(pat), F.lit(rep))
                     .alias("enc"), "freq")
                 .localCheckpoint())
    return spark.createDataFrame(
        merges, "merge_rank int, left_sym string, right_sym string")
