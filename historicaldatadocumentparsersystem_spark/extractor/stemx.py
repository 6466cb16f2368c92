"""Porter stemmer (Porter 1980, "An algorithm for suffix
stripping") — pure Python, from scratch, Spark-free.

The classic index-normalization step for retrieval-side operators
(TF-IDF/BM25/decontamination already exist; stemming folds surface
inflection before those run). This is the PAPER's rule set, not the
later "Porter2/English" revision — every rule below cites the step
table in the original publication, and tests pin the paper's own
example vectors.

Matching discipline (the subtle part): within a step, the LONGEST
matching suffix wins and its condition is then evaluated — if the
condition fails, the step ends WITHOUT trying shorter suffixes.

Word model: [C](VC)^m[V]; ``y`` is a vowel exactly when preceded by
a consonant (so the leading ``y`` of "yellow" is a consonant, the
``y`` of "sky" is a vowel... no: "sky" ends consonant-y preceded by
k = consonant -> that y is a VOWEL position per the definition; see
``_is_cons``).

Only ASCII lowercase words are stemmed; anything else returns
unchanged (callers lowercase + tokenize first — ``tokens``).
"""

from __future__ import annotations

import re

_TOKEN_RE = re.compile(r"[a-z]+")

_VOWELS = frozenset("aeiou")


def tokens(text: str) -> list[str]:
    """Lowercase [a-z]+ runs — the ONE tokenizer both the golden
    generator and the Spark op use."""
    return _TOKEN_RE.findall(text.lower())


def _is_cons(w: str, i: int) -> bool:
    ch = w[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC)^m[V]."""
    m = 0
    i, n = 0, len(stem)
    while i < n and _is_cons(stem, i):
        i += 1
    while i < n:
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return (len(w) >= 2 and w[-1] == w[-2]
            and _is_cons(w, len(w) - 1))


def _ends_cvc(w: str) -> bool:
    if len(w) < 3:
        return False
    return (_is_cons(w, len(w) - 3)
            and not _is_cons(w, len(w) - 2)
            and _is_cons(w, len(w) - 1)
            and w[-1] not in "wxy")


def _rule_table(word: str, rules) -> str:
    """Longest-match-wins step: rules is [(suffix, replacement,
    min_m_exclusive)]; condition = m(stem) > min_m. Returns the
    (possibly unchanged) word; stops after the longest match."""
    best = None
    for suf, rep, min_m in rules:
        if word.endswith(suf) and (
                best is None or len(suf) > len(best[0])):
            best = (suf, rep, min_m)
    if best is None:
        return word
    suf, rep, min_m = best
    stem = word[:-len(suf)]
    if _measure(stem) > min_m:
        return stem + rep
    return word


_STEP2 = [("ational", "ate", 0), ("tional", "tion", 0),
          ("enci", "ence", 0), ("anci", "ance", 0),
          ("izer", "ize", 0), ("abli", "able", 0),
          ("alli", "al", 0), ("entli", "ent", 0), ("eli", "e", 0),
          ("ousli", "ous", 0), ("ization", "ize", 0),
          ("ation", "ate", 0), ("ator", "ate", 0),
          ("alism", "al", 0), ("iveness", "ive", 0),
          ("fulness", "ful", 0), ("ousness", "ous", 0),
          ("aliti", "al", 0), ("iviti", "ive", 0),
          ("biliti", "ble", 0)]

_STEP3 = [("icate", "ic", 0), ("ative", "", 0), ("alize", "al", 0),
          ("iciti", "ic", 0), ("ical", "ic", 0), ("ful", "", 0),
          ("ness", "", 0)]

_STEP4 = [("al", "", 1), ("ance", "", 1), ("ence", "", 1),
          ("er", "", 1), ("ic", "", 1), ("able", "", 1),
          ("ible", "", 1), ("ant", "", 1), ("ement", "", 1),
          ("ment", "", 1), ("ent", "", 1), ("ou", "", 1),
          ("ism", "", 1), ("ate", "", 1), ("iti", "", 1),
          ("ous", "", 1), ("ive", "", 1), ("ize", "", 1)]


def porter_stem(word: str) -> str:
    if not word.isascii() or not word.islower() or len(word) <= 2:
        return word
    w = word

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    flag_1b = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        flag_1b = True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        flag_1b = True
    if flag_1b:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w += "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Steps 2-4
    w = _rule_table(w, _STEP2)
    w = _rule_table(w, _STEP3)
    if w.endswith("ion"):
        # (m>1 and (*S or *T)) ION ->  — the special step-4 row
        stem = w[:-3]
        if stem.endswith(("s", "t")) and _measure(stem) > 1:
            w = stem
    else:
        w = _rule_table(w, _STEP4)

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem

    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w[-1] == "l":
        w = w[:-1]

    return w
