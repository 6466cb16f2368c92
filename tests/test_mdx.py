"""Markdown serializer (extractor/mdx.py, golden-pinned) and its
mapInPandas operator + markdown_stats composition."""

import pyarrow.parquet as pq
from hypothesis import given, settings, strategies as st

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import mdx
from historicaldatadocumentparsersystem_spark.operators import pagemeta

GOLDEN_MD = "fixtures/golden_markdown_seed42_n120.parquet"


def test_markdown_matches_committed_golden():
    """Pins mdx semantics the way test_golden pins extraction: the
    committed parquet must equal a fresh pure-Python re-derivation."""
    golden = {r["url"]: r["markdown"]
              for r in pq.read_table(GOLDEN_MD).to_pylist()}
    fresh = {p["url"]: mdx.to_markdown(p["html"])
             for p in fixtures.md_pages(120) if p["html"]}
    assert set(golden) == set(fresh)
    for url, md in fresh.items():
        assert golden[url] == md, url


def test_headings_and_paragraphs():
    md = mdx.to_markdown(
        "<h1> Big &amp; Bold </h1><h3>Three<br>lines</h3>"
        "<p>one</p>bare run<p>two</p><h7>not a heading</h7>")
    assert md.split("\n\n") == [
        "# Big & Bold", "### Three lines", "one", "bare run", "two",
        "not a heading"]


def test_inline_markers_and_escaping():
    md = mdx.to_markdown(
        "<p>a *b* _c_ [d] `e` f\\g <b> bold </b> <em>it</em> "
        "<del>x</del> <span>span</span></p>")
    assert md == ("a \\*b\\* \\_c\\_ \\[d\\] \\`e\\` f\\\\g "
                  "**bold** *it* ~~x~~ span")
    # empty emphasis never emits bare markers
    assert mdx.to_markdown("<p>x<b>  </b>y</p>") == "x y"


def test_links_and_images():
    md = mdx.to_markdown(
        '<p><a href="/a (b) c">lnk</a> <a href="">no href</a> '
        '<a href="/x"><img src="i.png" alt="pic"></a> '
        '<img src="" alt="altonly"></p>')
    assert md == ("[lnk](/a%20%28b%29%20c) no href "
                  "[![pic](i.png)](/x) altonly")


def test_code_spans_and_fences():
    # span fence widens past inner backtick runs
    assert mdx.to_markdown("<p><code>a``b</code></p>") == "```a``b```"
    assert mdx.to_markdown("<p><code>`lead</code></p>") == "`` `lead ``"
    md = mdx.to_markdown(
        '<pre><code class="language-Rust">fn main() {\n'
        '    x; // ```\n}</code></pre>')
    assert md == "````rust\nfn main() {\n    x; // ```\n}\n````"
    # entities unescape, blank lines survive, no language -> bare fence
    assert mdx.to_markdown("<pre>a &lt;b&gt;\n\n  c</pre>") \
        == "```\na <b>\n\n  c\n```"


def test_lists_nested_and_ordered_renumber():
    md = mdx.to_markdown(
        '<ol start="7"><li>x</li><li><p>p1</p><ul><li>in</li></ul>'
        "</li></ol>")
    assert md == "1. x\n2. p1\n   - in"
    # soup list: unclosed <li> autocloses
    assert mdx.to_markdown("<ul><li>a<li>b</ul>") == "- a\n- b"


def test_blockquote_and_hr():
    md = mdx.to_markdown(
        "<blockquote><p>a</p><blockquote>b</blockquote></blockquote>"
        "<hr/>")
    assert md == "> a\n>\n> > b\n\n---"


def test_table_shapes():
    md = mdx.to_markdown(
        "<table><tr><th>H|1</th><th>H2</th></tr>"
        "<tr><td>a</td><td>b</td><td>wide</td></tr>"
        "<tr><td>only</td></tr></table>")
    assert md == ("| H\\|1 | H2 |  |\n|" + " --- |" * 3 + "\n"
                  "| a | b | wide |\n| only |  |  |")
    # nested table: own block, excluded from the parent cell
    md = mdx.to_markdown(
        "<table><tr><td>out<table><tr><td>in</td></tr></table>"
        "</td></tr></table>")
    assert md == "| out |\n| --- |\n\n| in |\n| --- |"


def test_dropped_and_invisible_subtrees():
    md = mdx.to_markdown(
        "<head><title>t</title></head><body><script>a<b</script>"
        "<style>p{}</style><select><option>o</option></select>"
        "<p>kept</p><textarea>raw</textarea></body>")
    assert md == "kept"


def test_hard_break_and_nul_safety():
    assert mdx.to_markdown("<p>a<br>b<br><br>c</p>") == "a\nb\nc"
    # a literal NUL in source text must not become a fake hard break
    assert mdx.to_markdown("<p>a\x00b</p>") == "a�b"


def test_depth_cap_degrades_to_text():
    html = "<div>" * 200 + "deep *x*" + "</div>" * 200
    assert mdx.to_markdown(html) == "deep \\*x\\*"


@given(st.binary(max_size=2048))
@settings(max_examples=150, deadline=None)
def test_markdown_never_raises(payload):
    assert isinstance(mdx.to_markdown(payload), str)


@given(st.text(alphabet=st.sampled_from(
    list("<>/ab `*_[]()|#&;!-\n\"'=\x00")), max_size=300))
@settings(max_examples=150, deadline=None)
def test_markdown_tagsoup_never_raises(text):
    out = mdx.to_markdown(text)
    assert isinstance(out, str) and "\x00" not in out


def test_markdown_df_structural_identity(spark):
    got = {r["url"]: r["markdown"]
           for r in pagemeta.extract_markdown_df(
               fixtures.md_pages_df(spark, 40)).collect()}
    pure = {p["url"]: mdx.to_markdown(p["html"])
            for p in fixtures.md_pages(40) if p["html"]}
    assert got == pure and got


def test_markdown_df_plan_is_map_only(spark):
    docs = fixtures.md_pages_df(spark, 16)
    base = docs._jdf.queryExecution().executedPlan().toString()
    plan = pagemeta.extract_markdown_df(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == base.count("Exchange"), plan


def test_markdown_stats_hand_counts(spark):
    md = ("# h\n\npara [a](/x) and ![i](/y)\n\n- one\n- two\n"
          "1. three\n\n| a | b |\n| --- | --- |\n| 1 | 2 |\n\n"
          "```py\ncode\n```\n\n> quote\n>\n> more")
    df = spark.createDataFrame([("u", md)], "url string, markdown string")
    row = pagemeta.markdown_stats(df).collect()[0].asDict()
    assert row == {"url": "u", "n_chars": len(md), "n_headings": 1,
                   "n_list_items": 3, "n_table_rows": 2,
                   "n_code_blocks": 1, "n_quote_lines": 3,
                   "n_links": 2}
