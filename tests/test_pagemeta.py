"""Page-metadata layer: extractor/metax.py (golden-pinned) and the
mapInPandas operator (structural identity + map-only plan)."""

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import metax
from historicaldatadocumentparsersystem_spark.operators import pagemeta

GOLDEN_META = "fixtures/golden_meta_seed42_n120.parquet"


def _pure_rows(n: int) -> dict[str, dict]:
    out = {}
    for p in fixtures.meta_pages(n):
        if not p["html"]:
            continue
        out[p["url"]] = metax.extract_meta(p["html"], p["url"])
    return out


def test_meta_matches_committed_golden():
    """Pins metax semantics the way test_golden pins extraction: the
    committed parquet must equal a fresh pure-Python re-derivation."""
    golden = {r["url"]: {k: r[k] for k in metax.META_FIELDS}
              for r in pq.read_table(GOLDEN_META).to_pylist()}
    fresh = _pure_rows(120)
    assert set(golden) == set(fresh)
    for url, m in fresh.items():
        assert golden[url] == m, url


def test_meta_first_wins_case_and_entities():
    src = ('<html Lang=" pt-BR "><head>'
           '<title> A &amp; B </title><title>loser</title>'
           "<meta NAME='Description' content='d&#49;  one'>"
           '<meta name="description" content="loser">'
           '<link rel="ALTERNATE canonical" href="/c">'
           '<link rel="canonical" href="/loser">'
           '<meta property="OG:URL" content="og">'
           '</head><body></body></html>')
    m = metax.extract_meta(src, "https://h.example/dir/p.html")
    assert m["lang"] == "pt-BR"
    assert m["title"] == "A &amp; B"          # raw slice keeps entities
    assert m["description"] == "d1 one"       # attrs come back decoded
    assert m["canonical"] == "https://h.example/c"
    assert m["og_url"] == "https://h.example/dir/og"
    assert m["keywords"] is None and m["robots"] is None


def test_meta_empty_values_are_null():
    m = metax.extract_meta(
        '<html lang=""><head><title>  </title>'
        '<meta name="keywords" content="   ">'
        '<link rel="canonical" href=""></head></html>', "https://h/")
    assert all(m[k] is None for k in metax.META_FIELDS)


def test_meta_malformed_never_raises():
    for junk in (b"", b"<meta name=", b"\xff\xfe\x00garbage", None,
                 b"<title>unclosed", b"<<<>>>&#;&bogus",
                 b"<link rel href content>", b"<html lang"):
        m = metax.extract_meta(junk, "http://h/")
        assert set(m) == set(metax.META_FIELDS)


def test_meta_df_structural_identity(spark):
    """The Spark operator calls the same pure functions — row-for-row
    equality with the driver-side loop, including null skipping."""
    got = {r["url"]: {k: r[k] for k in metax.META_FIELDS}
           for r in pagemeta.extract_meta_df(
               fixtures.meta_pages_df(spark, 40)).collect()}
    assert got == _pure_rows(40)


def test_meta_df_plan_is_map_only(spark):
    """The operator adds zero shuffles over its input (the fixture df
    itself carries one round-robin repartition Exchange)."""
    docs = fixtures.meta_pages_df(spark, 16)
    base = docs._jdf.queryExecution().executedPlan().toString()
    plan = pagemeta.extract_meta_df(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == base.count("Exchange"), plan
