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


# --- document-level quality gates (Gopher / C4) --------------------------------

#: Gopher's "must contain >= 2 of these" stop-word list (Rae et al.
#: 2021, Appendix A.1.1) — the canonical eight.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(df: DataFrame, text_col: str = "text",
                 id_col: str = "url", min_words: int = 50,
                 max_words: int = 100_000) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021, Appendix A.1.1)
    as one pass of pure column expressions: word-count bounds, mean
    word length in [3, 10], symbol-to-word ratio (# and ellipsis)
    <= 0.1, <= 10% bullet-started lines, <= 30% ellipsis-ended lines,
    >= 80% of words containing an alphabetic character, and >= 2 hits
    from the canonical stop-word list.

    Every threshold is evaluated in CROSS-MULTIPLIED INTEGER form
    (e.g. mean word length in [3, 10] <=> 3*n_words <= total_chars
    <= 10*n_words), so the output carries no float ratios and the
    DuckDB oracle twin is hash-exact by construction.

    Scale: a narrow projection — no shuffle, no UDF, no explode; the
    split arrays live only inside one codegen stage. At 100 TB this is
    scan-bound and pushes column pruning down to (id, text).

    Reference analog: the reference gates documents one at a time
    before LLM calls (``utils/tools.py:84-99``); this is the published
    corpus-curation rule set a training pipeline runs at ingest.
    """
    words = tokens(text_col)
    low = F.transform(words, lambda w: F.lower(w))
    lines = F.split(F.col(text_col), "\n")
    n_words = F.size(words).cast("long")
    total_chars = F.aggregate(
        words, F.lit(0).cast("long"),
        lambda acc, w: acc + F.length(w).cast("long"))
    n_alpha = F.size(F.filter(
        words, lambda w: w.rlike("[A-Za-z]"))).cast("long")
    n_stop = F.size(F.filter(
        F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        lambda s: F.array_contains(low, s))).cast("long")
    hash_hits = (F.length(text_col)
                 - F.length(F.replace(F.col(text_col), F.lit("#"))))
    ell_hits = (
        (F.length(text_col)
         - F.length(F.replace(F.col(text_col), F.lit("...")))) / 3
        + F.length(text_col)
        - F.length(F.replace(F.col(text_col), F.lit("…"))))
    symbol_hits = ell_hits.cast("long") + hash_hits.cast("long")
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(F.filter(
        lines, lambda l: l.rlike(r"^\s*[-*•]"))).cast("long")
    n_ellipsis = F.size(F.filter(
        lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$"))).cast("long")
    out = df.select(
        F.col(id_col).alias("id"), n_words.alias("n_words"),
        total_chars.alias("total_word_chars"),
        n_alpha.alias("n_alpha_words"), n_stop.alias("n_stop_hits"),
        symbol_hits.alias("symbol_hits"), n_lines.alias("n_lines"),
        n_bullet.alias("n_bullet_lines"),
        n_ellipsis.alias("n_ellipsis_lines"))
    return out.select(
        "*",
        F.col("n_words").between(min_words, max_words).alias("r_word_count"),
        ((F.col("total_word_chars") >= 3 * F.col("n_words"))
         & (F.col("total_word_chars") <= 10 * F.col("n_words"))
         & (F.col("n_words") > 0)).alias("r_mean_word_len"),
        (10 * F.col("symbol_hits") <= F.col("n_words"))
        .alias("r_symbol_ratio"),
        (10 * F.col("n_bullet_lines") <= F.col("n_lines"))
        .alias("r_bullet_lines"),
        (10 * F.col("n_ellipsis_lines") <= 3 * F.col("n_lines"))
        .alias("r_ellipsis_lines"),
        (5 * F.col("n_alpha_words") >= 4 * F.col("n_words"))
        .alias("r_alpha_words"),
        (F.col("n_stop_hits") >= 2).alias("r_stop_words"),
    ).withColumn(
        "keep",
        F.col("r_word_count") & F.col("r_mean_word_len")
        & F.col("r_symbol_ratio") & F.col("r_bullet_lines")
        & F.col("r_ellipsis_lines") & F.col("r_alpha_words")
        & F.col("r_stop_words"))


def c4_line_filter(df: DataFrame, text_col: str = "text",
                   id_col: str = "url", min_line_words: int = 5,
                   min_kept_lines: int = 3) -> DataFrame:
    """C4 cleaning pass (Raffel et al. 2020 §2.2) as pure column
    expressions: keep only lines that end in terminal punctuation
    (. ! ? ") AND have >= ``min_line_words`` words AND do not mention
    'javascript'; then keep only documents with >=
    ``min_kept_lines`` surviving lines and no 'lorem ipsum' / '{'
    anywhere. Returns (id, n_lines, n_kept, keep, clean_text) where
    clean_text is the surviving lines re-joined with newlines —
    byte-exact against the DuckDB twin.

    Scale: like :func:`gopher_rules`, a single narrow projection (the
    line array is consumed inside one codegen stage; no explode means
    no row blow-up and no shuffle).
    """
    lines = F.split(F.col(text_col), "\n")
    line_words = (lambda l: F.size(F.filter(
        F.split(F.trim(l), r"\s+"), lambda t: t != "")))
    # terminal punctuation via last-char compare, NOT a '$'-anchored
    # regex: Java's '$' matches before a final \r/\n while the DuckDB
    # twin's RE2 '$' does not — substring is identical in both
    kept = F.filter(
        lines,
        lambda l: (F.substring(F.trim(l), -1, 1)
                   .isin(".", "!", "?", '"')
                   & (line_words(l) >= min_line_words)
                   & ~F.lower(l).contains("javascript")))
    return df.select(
        F.col(id_col).alias("id"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        ((F.size(kept) >= min_kept_lines)
         & ~F.lower(text_col).contains("lorem ipsum")
         & ~F.col(text_col).contains("{")).alias("keep"),
        F.concat_ws("\n", kept).alias("clean_text"))


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


# --- duplicated-substring (span) removal -------------------------------------

def duplicate_span_removal(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", ngram: int = 8,
                           max_doc_freq: int = 1) -> DataFrame:
    """Remove duplicated substrings across the corpus, Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better")
    adapted to Spark: the paper's suffix-array exact-substring pass
    becomes a hashed token-n-gram span pass — any window of ``ngram``
    consecutive tokens whose text occurs in more than ``max_doc_freq``
    distinct documents marks ALL its token positions as duplicated, and
    marked tokens are dropped before the per-document reassembly.
    Overlapping duplicated windows merge naturally (position-set
    union), so a long shared passage is removed end-to-end exactly as
    the suffix-array method would, quantized to token n-grams.

    Returns (doc_id, n_tokens, n_removed, text_kept). Documents
    shorter than ``ngram`` tokens have no windows and pass through
    unchanged; a document that is entirely boilerplate survives with
    text_kept = ''.

    Scale: windows are hashed to md5 BEFORE the frequency shuffle so
    the groupBy moves 16-byte keys, never window text, and is map-side
    combinable; the duplicated-hash set joins back by equi-join
    (fraction of distinct windows on a real crawl — broadcastable when
    small, plain hash join otherwise, never a cartesian). The covered-
    position explode is ``ngram``x the duplicated windows only, and
    the final anti-join + per-doc reassembly group on (doc, pos) /
    doc — bounded by document length, no unbounded window functions.
    Collisions: md5 over 128 bits, negligible at 10^12 windows (same
    budget as ``line_dedup``).
    """
    n = ngram
    base = df.select(F.col(id_col).alias("id"),
                     tokens(text_col).alias("tk"))
    grams = (base.where(F.size("tk") >= n)
             .select("id", F.posexplode(F.transform(
                 F.sequence(F.lit(1), F.size("tk") - n + 1),
                 lambda i: F.concat_ws(" ", F.slice("tk", i, n))))
                 .alias("p0", "gram"))
             .select("id", (F.col("p0") + 1).alias("p"),
                     F.md5("gram").alias("gh")))
    dup = (grams.groupBy("gh")
           .agg(F.countDistinct("id").alias("gdf"))
           .where(F.col("gdf") > max_doc_freq).select("gh"))
    cov = (grams.join(dup, "gh")
           .select("id", F.explode(
               F.sequence(F.col("p"), F.col("p") + n - 1)).alias("pos"))
           .distinct())
    tokpos = (base.select("id", F.posexplode("tk").alias("p0", "tok"))
              .select("id", (F.col("p0") + 1).alias("pos"), "tok"))
    kept = (tokpos.join(cov, ["id", "pos"], "left_anti")
            .groupBy("id")
            .agg(F.count("*").alias("n_kept"),
                 F.concat_ws(" ", F.array_sort(F.collect_list(
                     F.struct("pos", "tok"))).tok).alias("text_kept")))
    totals = base.select("id", F.size("tk").cast("long").alias("n_tokens"))
    return (totals.join(kept, "id", "left")
            .select(F.col("id").alias("doc_id"), "n_tokens",
                    (F.col("n_tokens") -
                     F.coalesce("n_kept", F.lit(0))).alias("n_removed"),
                    F.coalesce("text_kept", F.lit("")).alias("text_kept")))


# --- benchmark decontamination ------------------------------------------------

def decontaminate(df: DataFrame, benchmark: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  bench_text_col: str = "text",
                  ngram: int = 8) -> DataFrame:
    """Flag training documents that overlap an evaluation benchmark
    (the GPT-3-appendix / open-LM-eval decontamination step): a
    document is contaminated when any of its ``ngram``-token windows
    also occurs in any benchmark text.

    Returns (doc_id, n_grams, n_hits, contaminated) — n_hits counts
    overlapping windows (not distinct grams), so downstream can
    threshold instead of hard-dropping.

    Scale: benchmark suites are tiny next to the corpus — their gram
    set broadcasts; the corpus side streams through one hashed-window
    projection + broadcast semi-join + per-doc groupBy. Window hashes
    are md5 (16-byte keys, same budget as line_dedup); the corpus is
    never shuffled on text.
    """
    n = ngram

    def grams(frame: DataFrame, idc, txt) -> DataFrame:
        tk = tokens(txt)
        return (frame.select(F.col(idc).alias("id"), tk.alias("tk"))
                .where(F.size("tk") >= n)
                .select("id", F.explode(F.transform(
                    F.sequence(F.lit(1), F.size("tk") - n + 1),
                    lambda i: F.md5(F.concat_ws(
                        " ", F.slice("tk", i, n))))).alias("gh")))

    bench = (grams(benchmark.select(
        F.lit(0).alias("__bid"), F.col(bench_text_col)), "__bid",
        bench_text_col)
        .select("gh").distinct())
    doc_grams = grams(df, id_col, text_col)
    hits = (doc_grams.join(F.broadcast(bench), "gh")
            .groupBy("id").agg(F.count("*").alias("n_hits")))
    totals = (df.select(F.col(id_col).alias("id"), tokens(text_col)
                        .alias("tk"))
              .select("id", F.greatest(F.size("tk") - n + 1, F.lit(0))
                      .cast("long").alias("n_grams")))
    return (totals.join(hits, "id", "left")
            .select(F.col("id").alias(id_col), "n_grams",
                    F.coalesce("n_hits", F.lit(0)).cast("long")
                    .alias("n_hits"),
                    F.when(F.coalesce("n_hits", F.lit(0)) > 0, F.lit(1))
                    .otherwise(F.lit(0)).cast("long")
                    .alias("contaminated")))
