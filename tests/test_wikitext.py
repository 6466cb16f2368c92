"""MediaWiki wikitext source: extractor/wikix.py (pure oracle,
golden-pinned), the documented subset semantics, and the Spark
readers."""

import random

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import wikix

GOLDEN_ELS = "fixtures/golden_wikitext_elements_seed42_n40.parquet"
GOLDEN_LKS = "fixtures/golden_wiki_links_seed42_n40.parquet"


def _pure() -> tuple[list[tuple], list[tuple]]:
    els, lks = [], []
    for r in fixtures.wikitext_rows(40):
        links: list = []
        for e in wikix.parse_wikitext(r["wikitext"], links):
            els.append((r["url"], e.para, e.kind, e.level, e.text))
        for lk in links:
            lks.append((r["url"], lk.pos, lk.target, lk.label))
    return els, lks


def test_matches_committed_goldens():
    els, lks = _pure()
    g_els = [(r["url"], r["para"], r["kind"], r["level"], r["text"])
             for r in pq.read_table(GOLDEN_ELS).to_pylist()]
    g_lks = [(r["url"], r["pos"], r["target"], r["label"])
             for r in pq.read_table(GOLDEN_LKS).to_pylist()]
    assert g_els == els and len(g_els) == 165
    assert g_lks == lks and len(g_lks) == 55


def test_links_and_pipe_semantics():
    links = wikix.wiki_links(
        "[[A|label]] [[B]] [[Help:Topic|]] [[File:x.png|thumb|"
        "[[Cap]] text]] [[Category:Y]] {{tmpl|[[InTmpl]]}}")
    assert [(l.target, l.label) for l in links] == [
        ("A", "label"), ("B", "B"), ("Help:Topic", "Topic"),
        ("Cap", "Cap")]
    # table links never register; kept text around the table does
    els = wikix.parse_wikitext(
        "before\n{| x\n| [[T]]\n|}\nafter [[K]]")
    assert [e.text for e in els] == ["before", "after K"]
    assert [l.target for l in wikix.wiki_links(
        "before\n{| x\n| [[T]]\n|}\nafter [[K]]")] == ["K"]


def test_headings_lists_and_paragraph_joins():
    els = wikix.parse_wikitext(
        "= One =\n====== Six ======\n==Two====\n"
        "line a\nline b\n\nline c\n"
        "* l1\n** l2\n*#: mixed3\n; term\n")
    assert [(e.kind, e.level, e.text) for e in els] == [
        ("heading", 1, "One"), ("heading", 6, "Six"),
        ("heading", 2, "Two"),
        ("text", 0, "line a line b"), ("text", 0, "line c"),
        ("list_item", 1, "l1"), ("list_item", 2, "l2"),
        ("list_item", 3, "mixed3"), ("list_item", 1, "term")]
    # a bare "=" line with no title is a paragraph, not a heading
    assert wikix.parse_wikitext("====\n")[0].kind == "text"


def test_templates_refs_comments_nowiki():
    assert wikix.parse_wikitext("{{a|{{b}}|c}}x") == [
        wikix.WikiElement(0, "text", 0, "x")]
    assert wikix.parse_wikitext("{{never closed\nrest") == []
    assert [e.text for e in wikix.parse_wikitext(
        "kept<ref>gone {{t}}</ref> tail<ref name=x/>")] == ["kept tail"]
    assert [e.text for e in wikix.parse_wikitext(
        "a<!-- c1 -->b<!-- unterminated")] == ["ab"]
    els = wikix.parse_wikitext(
        "<nowiki>[[x]] {{y}}</nowiki> then [[Real]]")
    assert els[0].text == "[[x]] {{y}} then Real"
    assert [l.target for l in wikix.wiki_links(
        "<nowiki>[[x]]</nowiki> [[Real]]")] == ["Real"]


def test_inline_cleanup():
    els = wikix.parse_wikitext(
        "'''Bold''' and ''italic'' <b>tagged</b> text "
        "[https://e.org label] bare [https://e.org] __TOC__ end")
    assert els[0].text == "Bold and italic tagged text label bare end"


def test_extract_text_spans():
    src = "== H ==\npara one\n\npara two"
    text, spans = wikix.extract_wikitext(src)
    assert text == "H\npara one\npara two"
    for (a, b, kind), want in zip(spans, ("heading", "text", "text")):
        assert kind == want and text[a:b]
    assert wikix.extract_wikitext("") == ("", [])
    assert wikix.extract_wikitext(None) == ("", [])


def test_never_raises_on_fuzz():
    rng = random.Random("wikix-fuzz")
    alpha = "ab =*#;:{}[]|'<>!-\nref/ nowiki"
    for _ in range(300):
        s = "".join(rng.choice(alpha) for _ in range(rng.randrange(200)))
        for e in wikix.parse_wikitext(s):
            assert e.text.strip() == e.text and e.text
        wikix.wiki_links(s)
        wikix.extract_wikitext(s)


def test_spark_readers_match_golden(spark):
    from historicaldatadocumentparsersystem_spark import sources
    pages = fixtures.wikitext_rows(40)
    df = spark.createDataFrame(
        [(r["url"], r["wikitext"]) for r in pages],
        "url string, wikitext string").repartition(4)
    els, lks = _pure()
    got_e = sorted(tuple(r)
                   for r in sources.read_wikitext_elements(df).collect())
    got_l = sorted(tuple(r) for r in sources.read_wiki_links(df).collect())
    assert got_e == sorted(els)
    assert got_l == sorted(lks)


def test_wiki_dump_matches_committed_golden():
    GOLDEN_DUMP = "fixtures/golden_wiki_dump_seed42_n12.parquet"
    pure = []
    for r in fixtures.wiki_dump_rows(12):
        for p in wikix.parse_wiki_dump(r["payload"]):
            pure.append((r["url"], p.idx, p.title, p.ns, p.page_id,
                         p.redirect, p.wikitext))
    golden = [(r["url"], r["page_idx"], r["title"], r["ns"],
               r["page_id"], r["redirect"], r["wikitext"])
              for r in pq.read_table(GOLDEN_DUMP).to_pylist()]
    assert golden == pure
    assert len(golden) == 33


def test_wiki_dump_semantics():
    dump = (b'<mediawiki xmlns="http://www.mediawiki.org/xml/'
            b'export-0.10/"><page><title>T &amp; U</title><ns>0</ns>'
            b'<id>7</id><redirect title="V"/><revision><id>99</id>'
            b'<text>first</text></revision><revision><text>second'
            b'</text></revision></page></mediawiki>')
    pages = wikix.parse_wiki_dump(dump)
    assert len(pages) == 1
    p = pages[0]
    # entities unescape, page id wins over revision id, first
    # revision's text wins, redirect target captured
    assert (p.title, p.page_id, p.redirect, p.wikitext) == \
        ("T & U", 7, "V", "first")
    assert wikix.parse_wiki_dump(b"<html>no</html>") == []
    assert wikix.parse_wiki_dump(b"<mediawiki><page><title>x") == []
    assert wikix.parse_wiki_dump(None) == []


def test_wiki_dump_chains_into_element_reader(spark):
    from historicaldatadocumentparsersystem_spark import sources
    files = fixtures.wiki_dump_rows(12)
    df = spark.createDataFrame(
        [(r["url"], r["payload"]) for r in files],
        "url string, payload binary").repartition(4)
    pages = sources.read_wiki_dump(df)
    # the dump is the container; wikix parses the content column
    els = sources.read_wikitext_elements(
        pages.selectExpr("concat(url, '#', title) AS url", "wikitext"))
    got = sorted(tuple(r) for r in els.collect())
    pure = []
    for r in files:
        for p in wikix.parse_wiki_dump(r["payload"]):
            for e in wikix.parse_wikitext(p.wikitext):
                pure.append((f"{r['url']}#{p.title}", e.para, e.kind,
                             e.level, e.text))
    assert got == sorted(pure) and got
