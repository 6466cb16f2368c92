"""Web-corpus curation operators a 100 TB training pipeline runs
between raw extraction and tokenization: line-level dedup (CCNet
style), URL canonicalization, deterministic stratified sampling,
length histograms, TF-IDF salient terms.

All plans are built from JVM-side built-ins (no Python UDFs) so every
operator has an exact DuckDB oracle twin in ``__spark_entry__``.

Scale notes per operator live on the function docstrings; the common
theme: one hash-keyed shuffle per stage, frequency tables joined back
by equi-join (broadcast when the dup/df side is small), no windows
over unbounded groups, no collect() of row data.

Reference analog: the reference cleans documents row-at-a-time before
LLM calls (``utils/tools.py:84-99`` strip, ``doc_processor.py:96-99``
token budget); these are the corpus-level (cross-document) versions of
that hygiene pass, which a single-process engine cannot express.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import tokens


# --- line-level dedup (CCNet-style) -----------------------------------------

def doc_lines(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id", line_words: int = 8) -> DataFrame:
    """Deterministic (id, pos, line) rows: fixed ``line_words``-word
    segments in reading order (the corpus carries no newlines, so the
    segmenter IS the line model — same derivation as the chunking
    fixture)."""
    toks = tokens(text_col)
    segs = F.transform(
        F.sequence(F.lit(1), F.greatest(
            ((F.size(toks) + line_words - 1) / line_words).cast("int"),
            F.lit(1))),
        lambda i: F.concat_ws(
            " ", F.slice(toks, (i - 1) * line_words + 1, line_words)))
    return (df.select(F.col(id_col).alias("id"),
                      F.posexplode(segs).alias("pos", "line"))
            .where(F.col("line") != ""))


def line_dedup(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", line_words: int = 8,
               max_doc_freq: int = 2) -> DataFrame:
    """Remove lines that occur in more than ``max_doc_freq`` distinct
    documents (boilerplate: nav bars, cookie banners, footers), CCNet
    style; reassemble the per-document residual text.

    Returns (doc_id, n_lines, n_kept, text_kept). Docs whose every
    line is boilerplate survive with n_kept = 0, text_kept = ''.

    Scale: line frequencies are ONE groupBy on md5(line) (16-byte key,
    map-side combinable — never shuffles the line text); the dup-line
    set (doc_freq > k) is a small fraction of distinct lines on a real
    corpus, so the removal join is a broadcast LEFT ANTI in practice —
    expressed here as an equi-join on the hash so the optimizer (AQE)
    picks broadcast when the frequency side fits.
    """
    lines = doc_lines(df, text_col, id_col, line_words) \
        .withColumn("lh", F.md5("line"))
    freq = (lines.groupBy("lh")
            .agg(F.countDistinct("id").alias("doc_freq")))
    dup = freq.where(F.col("doc_freq") > max_doc_freq).select("lh")
    kept = lines.join(dup, "lh", "left_anti")
    kept_agg = (kept.groupBy("id")
                .agg(F.count("*").alias("n_kept"),
                     F.concat_ws(" ", F.transform(
                         F.array_sort(F.collect_list(
                             F.struct("pos", "line"))),
                         lambda s: s["line"])).alias("text_kept")))
    totals = lines.groupBy("id").agg(F.count("*").alias("n_lines"))
    return (totals.join(kept_agg, "id", "left")
            .select(F.col("id").alias("doc_id"), "n_lines",
                    F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
                    F.coalesce("text_kept", F.lit("")).alias("text_kept")))


# --- URL canonicalization ----------------------------------------------------

def url_normalize(url_col: str | Column = "url") -> Column:
    """Canonical URL: lowercase scheme+authority, strip #fragment,
    drop default ports (http:80, https:443), strip the slash of a
    bare-root path. Pure string/regexp expression — identical rule in
    the DuckDB twin (backref syntax differs: $1 vs \\1, same regex).
    """
    u = F.col(url_col) if isinstance(url_col, str) else url_col
    u = F.regexp_replace(u, "#.*$", "")                  # fragment
    head = F.regexp_extract(u, r"^[^:/?#]+://[^/?#]*", 0)
    rest = F.substring(u, F.length(head) + 1, F.length(u))
    u = F.concat(F.lower(head), rest)                    # scheme+authority
    # captured-delimiter form (NOT lookahead: the DuckDB twin is RE2,
    # which has no lookahead; an unmatched optional group substitutes
    # as empty in both Java's $2 and RE2's \2)
    u = F.regexp_replace(u, r"^(http://[^/?#]*):80([/?#].*)?$", "$1$2")
    u = F.regexp_replace(u, r"^(https://[^/?#]*):443([/?#].*)?$", "$1$2")
    # bare root: 'scheme://host/' -> 'scheme://host'
    u = F.regexp_replace(u, r"^([a-z]+://[^/?#]+)/$", "$1")
    return u


def url_host(url_col: str | Column = "url") -> Column:
    u = F.col(url_col) if isinstance(url_col, str) else url_col
    host = F.regexp_extract(u, r"^[^:/?#]+://([^/?#:@]+(?::\d+)?)", 1)
    return F.lower(F.regexp_replace(host, r":\d+$", ""))


def url_domain(url_col: str | Column = "url") -> Column:
    """Registrable domain (eTLD+1) via the trimmed public-suffix list
    (``operators.psl``): longest-match against the exact 3-label then
    2-label suffix sets, else the default one-label TLD rule.

    Pure column expression — the ``isin`` over the static suffix sets
    compiles to a codegen'd InSet probe, no join, no shuffle; the
    DuckDB twin is the same CASE/IN cascade. A host that IS a public
    suffix (e.g. ``co.uk`` itself) has no registrable domain -> ''.
    """
    from . import psl
    host = url_host(url_col)
    last2 = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    last3 = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    last4 = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+\.[^.]+)$", 1)
    return (F.when(last3.isin(*sorted(psl.SUFFIX_3)), last4)
            .when(last2.isin(*sorted(psl.SUFFIX_2)), last3)
            .otherwise(last2))


def normalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    return df.select(
        "*",
        url_normalize(url_col).alias("url_norm"),
        url_host(url_col).alias("host"),
        url_domain(url_col).alias("domain"))


# --- deterministic stratified sampling ---------------------------------------

def stratified_sample(df: DataFrame, strata_col: str,
                      rates: dict[str, float], id_col: str = "doc_id",
                      seed: int = 42) -> DataFrame:
    """Keep each row iff hash_unit(id) < rate(stratum): an exact,
    shuffle-free, cluster-layout-independent sampler (same row set on
    any partitioning — unlike df.sample, which is seed+split
    dependent). Strata absent from ``rates`` are dropped (rate 0).

    Scale: a pure filter — pushes down past the scan's column pruning;
    no shuffle, no RNG state.
    """
    from ..functions import hash_unit
    u = hash_unit(id_col, seed=seed)
    rate = None
    for name, r in rates.items():
        cond = F.col(strata_col) == name
        rate = F.when(cond, F.lit(float(r))) if rate is None \
            else rate.when(cond, F.lit(float(r)))
    rate = rate.otherwise(F.lit(0.0))
    return df.where(u < rate)


# --- length histogram ---------------------------------------------------------

def length_histogram(df: DataFrame, col: str = "n_chars",
                     width: int = 50) -> DataFrame:
    """Fixed-width histogram of an integer column: one map-side
    combinable groupBy on the bucket ordinal."""
    b = F.floor(F.col(col) / width).cast("int").alias("bucket")
    return (df.groupBy(b)
            .agg(F.count("*").alias("n"),
                 F.min(col).alias("lo"),
                 F.max(col).alias("hi")))


# --- TF-IDF salient terms -----------------------------------------------------

def tfidf_top_terms(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """Top-k terms per document by tf-idf (idf = ln((N+1)/(df+1)) + 1,
    scikit-style smoothing), ties broken by term asc on the ROUNDED
    score so Spark and the oracle sort identical keys.

    Scale: tf is one (id, term) groupBy (map-side combine); df is one
    term groupBy whose output is |vocabulary| rows — broadcast to the
    tf side (hinted) since vocabulary << corpus; N rides in as a 1-row
    aggregate via a broadcast crossJoin (the unigram_logppl pattern) —
    fully lazy, no eager driver action at plan-build time.
    The final top-k window partitions by doc — bounded groups.
    """
    tok = (df.select(F.col(id_col).alias("id"),
                     F.explode(tokens(text_col)).alias("t"))
           .select("id", F.lower("t").alias("term")))
    tf = tok.groupBy("id", "term").agg(F.count("*").alias("tf"))
    dfreq = tok.groupBy("term").agg(
        F.countDistinct("id").alias("doc_freq"))
    totals = df.agg(F.count("*").cast("double").alias("__n_docs"))
    idf = F.log((F.col("__n_docs") + 1) / (F.col("doc_freq") + 1)) + 1
    scored = (tf.join(F.broadcast(dfreq), "term")
              .crossJoin(F.broadcast(totals))
              .withColumn("tfidf", F.round(F.col("tf") * idf, 6))
              .drop("__n_docs"))
    from pyspark.sql import Window
    w = Window.partitionBy("id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .select(F.col("id").alias("doc_id"), "term", "tf",
                    "doc_freq", "tfidf", "rk"))
