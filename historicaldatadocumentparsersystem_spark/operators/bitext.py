"""Bitext pair mining from gettext catalogs (PO entries ->
(source, target, lang) training pairs).

The standard MT-data recipe over l10n catalogs: drop fuzzy /
obsolete / untranslated entries, gate on a length ratio (a target
wildly longer or shorter than its source is a mistranslation or a
placeholder), and tag each pair with the catalog's declared
header language. All JVM built-ins — one equi-join on url (the
per-catalog language), no UDFs; the length gate is an integer
cross-multiply so no float ever reaches a driver hash.

100 TB shape: catalogs are small and independent; everything here
is map-side except the url equi-join against the (tiny) one-row-
per-catalog header table, which AQE broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# first `Language:` line of the header entry's metadata block
# (anchored at text start or after a newline — the same
# first-occurrence-wins read as extractor.pox.header_fields)
LANG_RE = r"(^|\n)Language:[ \t]*([^\n]*)"

# shared pair-quality gate constants (the SQL twins generate their
# predicates from these — never hand-retyped)
MAX_RATIO = 3
MIN_CHARS = 2


def length_ratio_gate(df: DataFrame, src_col: str = "src",
                      tgt_col: str = "tgt",
                      max_ratio: int = MAX_RATIO,
                      min_chars: int = MIN_CHARS) -> DataFrame:
    """Keep pairs where both sides are >= ``min_chars`` chars and
    within ``max_ratio``x of each other's char length (integer
    cross-multiply, no division — no float reaches a driver
    hash)."""
    sl = F.length(src_col)
    tl = F.length(tgt_col)
    return df.where((sl >= min_chars) & (tl >= min_chars)
                    & (sl <= F.lit(max_ratio) * tl)
                    & (tl <= F.lit(max_ratio) * sl))


def po_catalog_langs(entries: DataFrame) -> DataFrame:
    """One row per catalog url: the declared header language
    (NULL when the file has no header entry or no Language field).
    The header entry is the one with msgid = '' (first wins by
    pos, the gettext rule)."""
    hdr = (entries.where(F.col("msgid") == "")
           .select("url", "pos",
                   F.nullif(F.trim(F.regexp_extract(
                       "msgstr", LANG_RE, 2)), F.lit(""))
                   .alias("lang"))
           .where(F.col("lang").isNotNull()))
    return (hdr.groupBy("url")
            .agg(F.min_by("lang", "pos").alias("lang")))


def po_bitext_pairs(entries: DataFrame,
                    max_ratio: int = MAX_RATIO,
                    min_chars: int = MIN_CHARS) -> DataFrame:
    """PO entries -> (url, pos, lang, src, tgt) candidate pairs:
    non-fuzzy, non-obsolete, both sides >= ``min_chars`` chars and
    within ``max_ratio``x of each other's char length (integer
    cross-multiply, no division)."""
    e = entries.where(
        (~F.col("fuzzy")) & (~F.col("obsolete"))
        & (F.col("msgid") != "") & (F.col("msgstr") != ""))
    e = length_ratio_gate(e, "msgid", "msgstr", max_ratio,
                          min_chars)
    langs = po_catalog_langs(entries)
    return (e.join(langs, "url", "left")
            .select("url", "pos", "lang",
                    F.col("msgid").alias("src"),
                    F.col("msgstr").alias("tgt")))


def tmx_bitext_pairs(rows: DataFrame,
                     max_ratio: int = MAX_RATIO,
                     min_chars: int = MIN_CHARS) -> DataFrame:
    """TMX tuv rows (url, tu, tuid, pos, srclang, lang, seg) ->
    one (src, tgt) pair per non-source tuv of each translation
    unit. The source tuv is the first one whose language equals
    the header's lowercased srclang; when srclang is absent or
    ``*all*``, the tu's first tuv is the source (the OPUS
    convention). One equi-join on (url, tu) — tus are tiny groups,
    never cross-corpus."""
    is_src = F.when(
        F.col("srclang").isNotNull()
        & (F.lower(F.col("srclang")) != "*all*"),
        F.col("lang") == F.lower(F.col("srclang"))
    ).otherwise(F.col("pos") == 0)
    src = (rows.where(is_src)
           .groupBy("url", "tu")
           .agg(F.min("pos").alias("src_pos"),
                F.min_by("lang", "pos").alias("src_lang"),
                F.min_by("seg", "pos").alias("src")))
    pairs = (rows.join(src, ["url", "tu"])
             .where(F.col("pos") != F.col("src_pos"))
             .select("url", "tu", "src_lang", "src",
                     F.col("lang").alias("tgt_lang"),
                     F.col("seg").alias("tgt")))
    return length_ratio_gate(pairs, "src", "tgt", max_ratio,
                             min_chars)
