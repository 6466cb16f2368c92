"""Rule-based sentence segmentation — pure Python, stdlib only.

The sentence is the unit below the line: C4 deduplicates three-
sentence spans, bitext mining aligns sentences, and quality filters
count terminal punctuation per sentence. The reference chunks by
document elements; this pass is the sub-element segmentation a
training pipeline runs over EXTRACTED text (it never sees markup).

Determinism contract (offsets index the INPUT string — span ops
compose downstream):
- a boundary is ``[.!?…]+`` + optional closing quotes/brackets +
  whitespace + an upper-case letter / digit / opening quote-bracket;
- newlines ALWAYS split (extracted text joins blocks with "\\n" —
  block boundaries are sentence boundaries by construction);
- guards that VETO a candidate period: a known abbreviation before it
  (``Mr. Smith``), a single-capital initial (``J. Smith``), and an
  intra-number dot never matches (no whitespace after);
- ``!``/``?``/``…`` are never vetoed;
- sentences are stripped of surrounding whitespace; empties dropped;
  a tail without terminal punctuation is still a sentence;
- (idx, start, end, text) with idx dense from 0, text ==
  ``src[start:end]``.
"""

from __future__ import annotations

import re

# lowercased, dotless; single capital letters are guarded separately
ABBREVIATIONS = frozenset((
    "mr", "mrs", "ms", "dr", "prof", "sr", "jr", "st", "vs", "etc",
    "e.g", "i.e", "cf", "fig", "figs", "no", "nos", "vol", "pp",
    "inc", "ltd", "co", "corp", "dept", "est", "approx", "jan", "feb",
    "mar", "apr", "jun", "jul", "aug", "sep", "sept", "oct", "nov",
    "dec",
))

_BOUNDARY_RE = re.compile(
    r"([.!?…]+)([\"'”’»)\]]*)"
    r"(\s+)(?=[A-Z0-9\"'“‘«(\[])")
_WORD_BEFORE_RE = re.compile(r"([\w.]+)$")


def _vetoed(src: str, punct_at: int, punct: str) -> bool:
    """True when the candidate boundary is an abbreviation/initial
    period, not a sentence end."""
    if punct != ".":
        return False            # ! ? … and multi-char runs always end
    m = _WORD_BEFORE_RE.search(src, 0, punct_at)
    if not m:
        return False
    word = m.group(1).rstrip(".")
    if not word:
        return False
    low = word.lower()
    if low in ABBREVIATIONS or low.rstrip(".") in ABBREVIATIONS:
        return True
    # single-capital initial: "J. Smith" (but not the pronoun "I.")
    return len(word) == 1 and word.isupper() and word != "I"


def split_sentences(src: str) -> list[tuple[int, int, int, str]]:
    """(idx, start, end, text) per sentence of ``src``."""
    out: list[tuple[int, int, int, str]] = []
    if not src:
        return out

    def emit(a: int, b: int) -> None:
        seg = src[a:b]
        lead = len(seg) - len(seg.lstrip())
        seg = seg.strip()
        if seg:
            start = a + lead
            out.append((len(out), start, start + len(seg), seg))

    cursor = 0
    for line_m in re.finditer(r"[^\n]+", src):
        line_start, line_end = line_m.start(), line_m.end()
        cursor = line_start
        for m in _BOUNDARY_RE.finditer(src, line_start, line_end):
            if _vetoed(src, m.start(1), m.group(1)):
                continue
            emit(cursor, m.end(2))
            cursor = m.end(3)
        emit(cursor, line_end)
    return out
