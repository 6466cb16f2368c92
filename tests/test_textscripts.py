"""Unicode script profile (textstats.script_profile): Spark counts vs
a pure-Python codepoint-range count over the committed multilingual
sample, and the dominant-script tie rules.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from historicaldatadocumentparsersystem_spark.operators import textstats  # noqa: E402


def _pure_profile(text):
    counts = {}
    for name, ranges in textstats.SCRIPT_RANGES:
        counts[name] = sum(
            1 for c in text
            if any(lo <= ord(c) <= hi for lo, hi in ranges))
    best = max(counts.values()) if counts else 0
    if best == 0:
        dom = "none"
    else:
        dom = next(n for n, _ in textstats.SCRIPT_RANGES
                   if counts[n] == best)
    return counts, dom


@pytest.mark.usefixtures("spark")
def test_script_profile_matches_pure(spark):
    rows = list(textstats.SCRIPT_SAMPLE_ROWS) + [
        (1, "plain ascii words"), (2, ""), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.asDict() for r in
           textstats.script_profile(df).collect()}
    for i, text in rows:
        counts, dom = _pure_profile(text or "")
        assert got[i]["n_chars"] == len(text or "")
        for name, _ in textstats.SCRIPT_RANGES:
            assert got[i][f"n_{name}"] == counts[name], (i, name)
        assert got[i]["dominant_script"] == dom, i


def test_sample_rows_cover_every_script():
    import collections
    doms = collections.Counter(
        _pure_profile(t)[1] for _, t in textstats.SCRIPT_SAMPLE_ROWS)
    for name, _ in textstats.SCRIPT_RANGES:
        assert doms[name] >= 1, f"no sample row is dominated by {name}"
    assert doms["none"] == 1  # the digits/punct row


def test_dominant_tie_prefers_declaration_order():
    # equal latin and cyrillic counts -> latin (declared first)
    counts, dom = _pure_profile("abc где")
    assert counts["latin"] == counts["cyrillic"] == 3
    assert dom == "latin"


@pytest.mark.usefixtures("spark")
def test_nfc_normalize_matches_unicodedata(spark):
    import unicodedata

    from historicaldatadocumentparsersystem_spark.operators import encoding
    rows = list(encoding.NFC_SAMPLE_ROWS) + [(1, "ascii"), (2, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.text_nfc, r.changed)
           for r in encoding.nfc_normalize_df(df).collect()}
    for i, t in rows:
        want = unicodedata.normalize("NFC", t or "")
        assert got[i] == (want, want != (t or "")), i


def test_nfc_sample_exercises_both_outcomes():
    import unicodedata

    from historicaldatadocumentparsersystem_spark.operators import encoding
    changed = [t != unicodedata.normalize("NFC", t)
               for _, t in encoding.NFC_SAMPLE_ROWS]
    assert any(changed) and not all(changed)


@pytest.mark.usefixtures("spark")
def test_script_lang_consistency_quadrants(spark):
    rows = [
        (1, "ru", "Это настоящий русский текст кириллицей здесь"),
        (2, "ru", "Eto transliterirovannyj russkij tekst latinicej"),
        (3, "zh", "这是一段真正的中文文本内容这里还有更多汉字"),
        (4, "el", "short"),                       # < 20 chars: never judged
        (5, "xx", "unmapped language never flags even in latin"),
        (6, "zh", "romanized chinese content long enough to judge"),
        (7, None, "null lang maps to any and never flags here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r.doc_id: (r.dominant_script, r.expected_script, r.mismatch)
           for r in textstats.script_lang_consistency(df).collect()}
    assert got[1] == ("cyrillic", "cyrillic", False)
    assert got[2] == ("latin", "cyrillic", True)
    assert got[3] == ("han", "han", False)
    assert got[4][2] is False
    assert got[5] == ("latin", "any", False)
    assert got[6] == ("latin", "han", True)
    assert got[7][1] == "any" and got[7][2] is False
