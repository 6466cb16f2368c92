"""End-to-end training-data pipeline: extract -> quality -> dedup -> chunk."""

from pyspark.sql import functions as F

from historicaldatadocumentparsersystem_spark import fixtures, training


def test_prepare_training_data(spark, tmp_path):
    docs = fixtures.corpus_df(spark, 150, num_partitions=4)
    # inject an exact duplicate payload under a different url
    dup = docs.where(F.col("url").contains("html-simple")).limit(1) \
        .withColumn("url", F.lit("https://dup.example.com/copy"))
    docs = docs.unionByName(dup)

    out = str(tmp_path / "train")
    stats = training.prepare_training_data(
        spark, docs, out, run_id="t1", min_quality=0.5, max_tokens=64,
        overlap=8, num_buckets=8)

    assert stats["n_input"] == 151
    assert stats["n_extracted"] == 151
    assert 0 < stats["n_quality_kept"] <= 151
    # the injected duplicate is removed, nothing else collapses
    assert stats["n_unique"] == stats["n_quality_kept"] - 1
    assert stats["n_chunks"] >= stats["n_unique"]

    chunks = spark.read.parquet(f"{out}/chunks")
    bad = chunks.where((F.col("n_tokens") <= 0)
                       | (F.col("n_tokens") > 64)).count()
    assert bad == 0
    # split assignment is carried onto every chunk and is well-formed
    splits = {r.split for r in chunks.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"} and "train" in splits
    # chunks of one document all share the document's split
    assert (chunks.groupBy("url")
            .agg(F.countDistinct("split").alias("k"))
            .where(F.col("k") > 1).count()) == 0
    # every chunk's text reassembles from its document's extracted blocks
    clean = spark.read.parquet(f"{out}/documents_clean")
    joined = (chunks.join(clean.select("url", "extracted_text"), "url")
              .select("url", "text", "extracted_text").limit(50).collect())
    for r in joined:
        for line in r.text.split("\n"):
            assert line in r.extracted_text


def test_quality_gate_drops_garbage(spark):
    docs = fixtures.corpus_df(spark, 100, num_partitions=4)
    from historicaldatadocumentparsersystem_spark import pipeline
    extracted = pipeline.extract_df(docs, num_buckets=4)
    kept = training.quality_gate(extracted)
    kinds = {r.doc_kind for r in kept.select("doc_kind").distinct().collect()}
    assert "html" in kinds
    # failed fallback rows never pass the gate
    assert kept.where(F.col("failed") == 1).count() == 0


def test_quality_gate_drops_soft404_shells(spark):
    """An extracted 'page' whose text is an error shell never reaches
    the kept set, while a long page discussing 404s survives."""
    from historicaldatadocumentparsersystem_spark import pipeline
    docs = fixtures.corpus_df(spark, 40, num_partitions=2)
    extracted = pipeline.extract_df(docs, num_buckets=4)
    shell = extracted.limit(1).withColumn(
        "url", F.lit("https://err.example.com/shell")).withColumn(
        "extracted_text", F.lit("Error 404 - page not found."))
    essay_text = ("A thorough essay on how servers answer a missing "
                  "resource. " * 20) + " The 404 code is historic."
    essay = extracted.limit(1).withColumn(
        "url", F.lit("https://ok.example.com/essay")).withColumn(
        "extracted_text", F.lit(essay_text))
    kept = training.quality_gate(
        extracted.unionByName(shell).unionByName(essay))
    urls = {r.url for r in kept.select("url").collect()}
    assert "https://err.example.com/shell" not in urls
    assert "https://ok.example.com/essay" in urls


def test_quality_gate_drops_interstitial_shells(spark):
    """A consent-banner shell and a short paywall stub never reach
    the kept set; a long article merely carrying a banner survives."""
    from historicaldatadocumentparsersystem_spark import pipeline
    docs = fixtures.corpus_df(spark, 40, num_partitions=2)
    extracted = pipeline.extract_df(docs, num_buckets=4)

    def fake(url, text):
        return (extracted.limit(1)
                .withColumn("url", F.lit(url))
                .withColumn("extracted_text", F.lit(text)))
    consent = fake("https://c.example/shell",
                   "We use cookies on this site. Accept all cookies "
                   "or review our cookie policy and cookie settings "
                   "before you continue browsing today, thanks a lot.")
    paywall = fake("https://p.example/stub",
                   "Subscribe to continue reading. Already a "
                   "subscriber? Sign in to read the full story here "
                   "with our premium membership plans available now.")
    carrier = fake("https://ok.example/article",
                   "We use cookies, accept all cookies to dismiss. "
                   + "A long and genuinely informative article body "
                     "about servers and archives. " * 20)
    kept = training.quality_gate(
        extracted.unionByName(consent).unionByName(paywall)
        .unionByName(carrier))
    urls = {r.url for r in kept.select("url").collect()}
    assert "https://c.example/shell" not in urls
    assert "https://p.example/stub" not in urls
    assert "https://ok.example/article" in urls


def test_export_training_data_handoff(spark, tmp_path):
    import json
    from historicaldatadocumentparsersystem_spark import fixtures, training
    out = str(tmp_path / "run")
    docs = fixtures.corpus_df(spark, 60, num_partitions=4)
    stats = training.prepare_training_data(
        spark, docs, out, run_id="r", num_buckets=8)
    res = training.export_training_data(spark, out, docs_per_shard=10)
    assert res["manifest"]["n_rows"] == stats["n_unique"]
    assert sum(res["manifest"]["shards"].values()) == stats["n_unique"]
    assert res["card"]["n_docs"] == stats["n_unique"]
    # splits appear as card buckets; shares sum to <= 10000 (floor div)
    shares = [v["doc_share_bp"] for v in res["card"]["languages"].values()]
    assert 0 < sum(shares) <= 10000
    # the exported JSONL round-trips through a plain JSON reader
    back = spark.read.json(f"{out}/export/data")
    assert back.count() == stats["n_unique"]
    assert json.load(open(f"{out}/export/dataset_card.json")) == res["card"]


def test_dedup_key_is_nfc_canonical(spark):
    # composed vs decomposed e-acute: identical rendering, different
    # bytes (C3A9 vs 65 CC81) — the NFC dedup key must collapse them
    # (smallest url wins) while the survivor's bytes stay EXACTLY as
    # extracted (key-side canonicalization only)
    rows = [("https://a.example/1", "café menu", 0),
            ("https://a.example/2", "café menu", 0),
            ("https://a.example/3", "other text", 0)]
    df = spark.createDataFrame(
        rows, "url string, extracted_text string, failed int")
    got = {r.url: r.extracted_text
           for r in training.dedup_extracted(df).collect()}
    assert set(got) == {"https://a.example/1", "https://a.example/3"}
    assert got["https://a.example/1"] == "caf\u00e9 menu"  # untouched bytes
