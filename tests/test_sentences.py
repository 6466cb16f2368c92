"""Sentence segmentation: extractor/sentx.py (golden-pinned over the
extraction golden's text), boundary rules, and the Spark operator."""

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark.extractor import sentx

GOLDEN = "fixtures/golden_extracted_seed42_n300.parquet"
GOLDEN_SENTS = "fixtures/golden_sentences_seed42.parquet"


def _pure_rows() -> list[tuple]:
    out = []
    for r in pq.read_table(GOLDEN).to_pylist():
        t = r.get("extracted_text")
        if not t:
            continue
        for row in sentx.split_sentences(t):
            out.append((r["url"], *row))
    return out


def test_sentences_match_committed_golden():
    golden = [(r["url"], r["idx"], r["start"], r["end"], r["sentence"])
              for r in pq.read_table(GOLDEN_SENTS).to_pylist()]
    assert golden == _pure_rows()
    assert len(golden) == 3830


def test_boundary_rules_and_guards():
    t = ("Dr. Smith met J. Doe at 3.14 km. They talked! Did they? "
         '"Yes." Then i.e. nothing... Next\nBlock two. Tail')
    texts = [s for _, _, _, s in sentx.split_sentences(t)]
    assert texts == [
        "Dr. Smith met J. Doe at 3.14 km.", "They talked!",
        "Did they?", '"Yes."', "Then i.e. nothing...", "Next",
        "Block two.", "Tail"]
    # offsets slice the source exactly
    for _, a, b, s in sentx.split_sentences(t):
        assert t[a:b] == s
    # lowercase after a period never splits; "I." is not an initial
    assert len(sentx.split_sentences("end. lower case")) == 1
    assert [s for *_, s in sentx.split_sentences("So did I. Then we")] \
        == ["So did I.", "Then we"]
    # closing bracket/quote rides with the sentence
    assert [s for *_, s in sentx.split_sentences('(Done.) Next one')] \
        == ["(Done.)", "Next one"]
    assert sentx.split_sentences("") == []
    assert sentx.split_sentences("\n\n") == []


def test_never_raises_on_arbitrary_text():
    import random
    rng = random.Random("sentx-fuzz")
    for _ in range(200):
        t = "".join(chr(rng.randrange(32, 1000))
                    for _ in range(rng.randrange(200)))
        for idx, a, b, s in sentx.split_sentences(t):
            assert t[a:b] == s and s.strip() == s and s


def test_operator_matches_golden(spark):
    from pyspark.sql import functions as F
    from historicaldatadocumentparsersystem_spark.operators import (
        textstats)
    docs = (spark.read.parquet(GOLDEN)
            .select("url", F.col("extracted_text").alias("text"))
            .where(F.length("text") > 0))
    got = sorted(tuple(r)
                 for r in textstats.sentence_split_df(docs).collect())
    golden = sorted(
        (r["url"], r["idx"], r["start"], r["end"], r["sentence"])
        for r in pq.read_table(GOLDEN_SENTS).to_pylist())
    assert got == golden
    plan = (textstats.sentence_split_df(docs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
