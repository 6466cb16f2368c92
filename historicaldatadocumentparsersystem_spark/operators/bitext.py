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


def po_bitext_pairs(entries: DataFrame, max_ratio: int = 3,
                    min_chars: int = 2) -> DataFrame:
    """PO entries -> (url, pos, lang, src, tgt) candidate pairs:
    non-fuzzy, non-obsolete, both sides >= ``min_chars`` chars and
    within ``max_ratio``x of each other's char length (integer
    cross-multiply, no division)."""
    e = entries.where(
        (~F.col("fuzzy")) & (~F.col("obsolete"))
        & (F.col("msgid") != "") & (F.col("msgstr") != ""))
    sl = F.length("msgid")
    tl = F.length("msgstr")
    e = e.where((sl >= min_chars) & (tl >= min_chars)
                & (sl <= F.lit(max_ratio) * tl)
                & (tl <= F.lit(max_ratio) * sl))
    langs = po_catalog_langs(entries)
    return (e.join(langs, "url", "left")
            .select("url", "pos", "lang",
                    F.col("msgid").alias("src"),
                    F.col("msgstr").alias("tgt")))
