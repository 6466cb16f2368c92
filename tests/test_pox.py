"""PO/gettext source: extractor/pox.py grammar vectors, golden pin,
Spark reader == golden parity, and the bitext pair gate."""

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import pox

GOLDEN_PO = "fixtures/golden_po_seed42_n20.parquet"


def _pure_rows(n: int) -> list[tuple]:
    out = []
    for r in fixtures.po_file_rows(n):
        for e in pox.extract_po_entries(r["payload"]):
            out.append((r["url"], e["pos"], e["ctxt"], e["msgid"],
                        e["msgid_plural"], e["msgstr"],
                        e["n_plurals"], e["fuzzy"], e["obsolete"],
                        " ".join(e["refs"])))
    return out


def test_po_matches_committed_golden():
    golden = [(r["url"], r["pos"], r["ctxt"], r["msgid"],
               r["msgid_plural"], r["msgstr"], r["n_plurals"],
               r["fuzzy"], r["obsolete"], r["refs"])
              for r in pq.read_table(GOLDEN_PO).to_pylist()]
    assert golden == _pure_rows(20)
    assert len(golden) == 60


def test_grammar_vectors():
    def one(t):
        es = pox.extract_po_entries(t)
        assert len(es) == 1
        return es[0]

    e = one('msgid "a"\nmsgstr "b"\n')
    assert (e["msgid"], e["msgstr"]) == ("a", "b")
    # continuation lines concatenate; escapes decode
    e = one('msgid ""\n"one "\n"two"\nmsgstr "x\\ny \\"z\\" \\\\"\n')
    assert e["msgid"] == "one two"
    assert e["msgstr"] == 'x\ny "z" \\'
    # unknown escape keeps backslash + char
    assert one('msgid "a"\nmsgstr "\\q"\n')["msgstr"] == "\\q"
    # plural entry: msgstr = [0] form, n_plurals counted
    e = one('msgid "f"\nmsgid_plural "fs"\n'
            'msgstr[0] "d"\nmsgstr[1] "ds"\n')
    assert (e["msgstr"], e["n_plurals"], e["msgid_plural"]) == \
        ("d", 2, "fs")
    # msgctxt + flags + refs attach to the right entry
    e = one('#: a.c:1 b.c:2\n#, fuzzy, c-format\n'
            'msgctxt "menu"\nmsgid "Open"\nmsgstr "Ouvrir"\n')
    assert (e["ctxt"], e["fuzzy"], e["refs"]) == \
        ("menu", True, ["a.c:1", "b.c:2"])
    # obsolete entries parse flagged
    e = one('#~ msgid "old"\n#~ msgstr "alt"\n')
    assert e["obsolete"] is True
    # two entries without a blank line split at the next msgid
    es = pox.extract_po_entries(
        'msgid "a"\nmsgstr "1"\nmsgid "b"\nmsgstr "2"\n')
    assert [(e["msgid"], e["msgstr"]) for e in es] == \
        [("a", "1"), ("b", "2")]
    # comments after msgstr belong to the NEXT entry
    es = pox.extract_po_entries(
        'msgid "a"\nmsgstr "1"\n#, fuzzy\nmsgid "b"\nmsgstr "2"\n')
    assert [(e["msgid"], e["fuzzy"]) for e in es] == \
        [("a", False), ("b", True)]
    # malformed entry drops whole; the next entry survives
    es = pox.extract_po_entries(
        'msgid "broken\nmsgstr "x"\n\nmsgid "ok"\nmsgstr "y"\n')
    assert [(e["msgid"]) for e in es] == ["ok"]
    # blank line inside a literal run breaks the continuation ->
    # stray string drops the entry
    assert pox.extract_po_entries(
        'msgid "a"\n\n"b"\nmsgstr "c"\n') == []
    assert pox.extract_po_entries("") == []
    assert pox.extract_po_entries(None) == []
    assert pox.extract_po_entries(b"") == []


def test_header_fields():
    h = pox.header_fields(
        "Language: fr\nPlural-Forms: nplurals=2; plural=(n > 1);\n"
        "Language: de\nBad line\n")
    # first occurrence wins; malformed lines skipped
    assert h["Language"] == "fr"
    assert h["Plural-Forms"].startswith("nplurals=2")
    assert "Bad line" not in h


def test_build_roundtrip_wrapped():
    entries = [{"msgid": "x" * 50 + "\ty", "msgstr": "z" * 35,
                "refs": ["f.c:1"]},
               {"ctxt": "c", "msgid": "m", "msgstr": "s",
                "fuzzy": True}]
    po = pox.build_po(entries, header={"Language": "es"}, width=12)
    got = pox.extract_po_entries(po)
    assert got[0]["msgid"] == ""
    assert pox.header_fields(got[0]["msgstr"])["Language"] == "es"
    assert got[1]["msgid"] == "x" * 50 + "\ty"
    assert got[1]["msgstr"] == "z" * 35
    assert got[2] == {"pos": 2, "ctxt": "c", "msgid": "m",
                      "msgid_plural": None, "msgstr": "s",
                      "n_plurals": 0, "fuzzy": True,
                      "obsolete": False, "refs": []}


def test_spark_reader_matches_golden(spark):
    from historicaldatadocumentparsersystem_spark import sources
    files = fixtures.po_file_rows(20)
    df = spark.createDataFrame(
        [(r["url"], r["payload"]) for r in files],
        "url string, payload binary").repartition(8)
    got = sorted((r.url, r.pos, r.ctxt, r.msgid, r.msgid_plural,
                  r.msgstr, r.n_plurals, r.fuzzy, r.obsolete,
                  r.refs)
                 for r in sources.read_po_entries(df).collect())
    assert got == sorted(_pure_rows(20))


def test_bitext_pairs_semantics(spark):
    from historicaldatadocumentparsersystem_spark.operators import \
        bitext
    rows = [
        # header: language declared
        ("u1", 0, None, "", None, "Language: fr\nX: y\n", 0,
         False, False, ""),
        ("u1", 1, None, "Hello", None, "Bonjour", 0, False,
         False, ""),
        # fuzzy, obsolete, untranslated: all dropped
        ("u1", 2, None, "Save", None, "Enregistrer", 0, True,
         False, ""),
        ("u1", 3, None, "Old", None, "Alt", 0, False, True, ""),
        ("u1", 4, None, "Pending", None, "", 0, False, False, ""),
        # ratio outlier (2 vs 40 chars at max_ratio=3) and a
        # too-short source
        ("u1", 5, None, "Hi", None, "x" * 40, 0, False, False, ""),
        ("u1", 6, None, "a", None, "bc", 0, False, False, ""),
        # headerless catalog: lang NULL, pair kept
        ("u2", 0, None, "Quit", None, "Beenden", 0, False,
         False, ""),
    ]
    df = spark.createDataFrame(
        rows, "url string, pos int, ctxt string, msgid string, "
              "msgid_plural string, msgstr string, n_plurals int, "
              "fuzzy boolean, obsolete boolean, refs string")
    got = sorted((r.url, r.pos, r.lang, r.src, r.tgt)
                 for r in bitext.po_bitext_pairs(df).collect())
    assert got == [("u1", 1, "fr", "Hello", "Bonjour"),
                   ("u2", 0, None, "Quit", "Beenden")]
    langs = {r.url: r.lang
             for r in bitext.po_catalog_langs(df).collect()}
    assert langs == {"u1": "fr"}


def test_lang_regexp_matches_header_fields():
    # the operator's regexp read of Language must agree with the
    # pure header_fields() on every fixture header
    import re
    from historicaldatadocumentparsersystem_spark.operators import \
        bitext
    seen = 0
    for r in fixtures.po_file_rows(20):
        for e in pox.extract_po_entries(r["payload"]):
            if e["msgid"] != "":
                continue
            m = re.search(bitext.LANG_RE, e["msgstr"])
            got = (m.group(2).strip() or None) if m else None
            want = pox.header_fields(e["msgstr"]).get("Language")
            assert got == want
            seen += 1
    assert seen >= 10
