"""Scholarly-identifier detection over plain text — DOIs, arXiv ids
(new ``YYMM.NNNNN`` and pre-2007 ``archive/YYMMNNN`` styles) and
ISBNs with real checksum validation. A training pipeline mines these
for citation graphs, decontamination against benchmark bibliographies
and academic-domain routing, the way it mines URLs for link graphs.

Spark-free on purpose (the repo invariant): this module is the
correctness oracle. The distributed operators in
``operators/idents.py`` re-express the SAME pattern constants as
JVM-side ``regexp_extract_all`` plans, and the DuckDB driver twin
re-expresses them again in RE2 — the triple cross-engine check of
the PII family (extractor/piix.py), which only holds on the common
regex subset: explicit ``[0-9]``/``[A-Za-z]`` classes, no
lookaround, no backreferences, ``\\b`` only against ASCII context.

Detection is precision-oriented, kind by kind:
- ``doi``: ``10.<4-9 digit registrant>/<suffix>``; the normalized id
  strips trailing sentence punctuation (``.,;:)]``) and lowercases
  (DOIs are case-insensitive per the handbook). Always valid once
  matched.
- ``arxiv_new``: requires a literal ``arXiv:`` prefix (any case,
  optional one space) before ``YYMM.NNNNN(vN)`` — the bare digit
  shape is too common to scan unanchored. Normalizes to the
  lowercase id without the prefix. Valid iff MM is 01-12.
- ``arxiv_old``: ``archive(.XX)?/YYMMNNN`` (e.g. ``hep-th/9901001``,
  ``math.GT/0309136``). Valid iff MM is 01-12.
- ``isbn``: requires a literal ``ISBN``/``ISBN-10``/``ISBN-13``
  prefix; hyphen-separated digit groups, final char may be ``X``
  (the ISBN-10 check digit). Normalizes to bare digits (X upper).
  Valid iff the stripped form is 10 chars passing the mod-11
  checksum, or 13 digits starting 978/979 passing the EAN mod-10
  checksum.

Kinds scan independently (instance semantics, like piix): a string
can in principle feed two kinds; the validity filters keep precision.

Reference analog: the reference's metadata extraction pulls
source/citation fields row-at-a-time via LLM calls
(``doc_processor.py``); this is the deterministic corpus-scale
counterpart its single-process engine never needed.
"""

from __future__ import annotations

import re

# Shared pattern constants — the single source of truth for the pure
# scanner, the Spark operators, and the generated DuckDB oracle SQL
# (the _W_SQL precedent: constants are GENERATED into SQL, never
# retyped). Common-subset regex only; see the module docstring.
DOI_RE = r"\b10[.][0-9]{4,9}/[-._;()/:A-Za-z0-9]+"
ARXIV_NEW_RE = (r"[aA][rR][xX][iI][vV]:[ ]?"
                r"[0-9]{4}[.][0-9]{4,5}(?:v[0-9]+)?")
ARXIV_OLD_RE = r"\b[a-z][a-z-]*(?:[.][A-Z]{2})?/[0-9]{7}\b"
ISBN_RE = r"ISBN(?:-1[03])?[:]?[ ]?[0-9][-0-9]{8,15}[0-9Xx]"

PATTERNS: dict[str, str] = {
    "doi": DOI_RE,
    "arxiv_new": ARXIV_NEW_RE,
    "arxiv_old": ARXIV_OLD_RE,
    "isbn": ISBN_RE,
}

# Normalization, shared semantics across the three engines:
# doi      -> lower(strip trailing [.,;:)\]])
# arxiv_new-> lower(strip the arXiv: prefix + optional space)
# arxiv_old-> verbatim (the class part is case-significant: math.GT)
# isbn     -> strip the ISBN(-10/-13): prefix FIRST (its digits must
#             not leak into the id), then strip hyphens, upper the X
DOI_TRAIL_RE = r"[.,;:)\]]+$"
ARXIV_PREFIX_RE = r"^[aA][rR][xX][iI][vV]:[ ]?"
ISBN_PREFIX_RE = r"^ISBN(?:-1[03])?[:]?[ ]?"
ISBN_SEP_RE = r"-"

_COMPILED = {kind: re.compile(pat) for kind, pat in PATTERNS.items()}


def normalize(kind: str, value: str) -> str:
    if kind == "doi":
        return re.sub(DOI_TRAIL_RE, "", value).lower()
    if kind == "arxiv_new":
        return re.sub(ARXIV_PREFIX_RE, "", value).lower()
    if kind == "isbn":
        bare = re.sub(ISBN_PREFIX_RE, "", value)
        return re.sub(ISBN_SEP_RE, "", bare).upper()
    return value


def isbn10_ok(ds: str) -> bool:
    """ISO 2108 mod-11 checksum; X=10 allowed in the last position."""
    if len(ds) != 10:
        return False
    total = 0
    for i, ch in enumerate(ds):
        if ch == "X":
            if i != 9:
                return False
            d = 10
        else:
            d = ord(ch) - 48
        total += (10 - i) * d
    return total % 11 == 0


def isbn13_ok(ds: str) -> bool:
    """EAN-13 mod-10 checksum; bookland prefix 978/979 required."""
    if len(ds) != 13 or "X" in ds or ds[:3] not in ("978", "979"):
        return False
    total = 0
    for i, ch in enumerate(ds):
        d = ord(ch) - 48
        total += d * (3 if i % 2 else 1)
    return total % 10 == 0


def _month_ok(mm: str) -> bool:
    return "01" <= mm <= "12"


def is_valid(kind: str, norm: str) -> bool:
    """Per-kind validity post-filter over the NORMALIZED id."""
    if kind == "doi":
        return True
    if kind == "arxiv_new":
        return _month_ok(norm[2:4])
    if kind == "arxiv_old":
        digits = norm.split("/", 1)[1]
        return _month_ok(digits[2:4])
    if kind == "isbn":
        if len(norm) == 10:
            return isbn10_ok(norm)
        return isbn13_ok(norm)
    return False


def find_identifiers(text: str) -> list[tuple[str, str, str]]:
    """(kind, value, ident) per VALID match instance, kinds in sorted
    order then text order within a kind — the exact row set the Spark
    explode plan and the DuckDB unnest twin produce."""
    out: list[tuple[str, str, str]] = []
    for kind in sorted(PATTERNS):
        for m in _COMPILED[kind].finditer(text or ""):
            norm = normalize(kind, m.group(0))
            if norm and is_valid(kind, norm):
                out.append((kind, m.group(0), norm))
    return out
