"""Randomized parity sweeps for the r6 numpy fast paths.

Every r6 optimization that moved arithmetic out of Spark expressions
keeps its r5 implementation as an in-repo reference; the fixed
adversarial vectors in test_operators.py pin the known edge cases,
and THESE sweeps pin bit-identity on deterministic-seed RANDOM data —
the defense against the driver generating data the local testdata
never exercised (the bm25-tie lesson: the divergence class bites on
values nobody hand-picked).
"""

import random

import pytest
from pyspark.sql import functions as F


def _rand_vecs(rng, n, dim, scale=1.0):
    return [(i, [float(rng.uniform(-scale, scale)) for _ in range(dim)])
            for i in range(n)]


def test_kmeans_arrow_random_sweep(spark):
    from historicaldatadocumentparsersystem_spark.operators import clustering
    rng = random.Random("r6-kmeans-sweep")
    for dim, k, n_iter, scale in ((8, 3, 3, 1.0), (16, 7, 2, 100.0),
                                  (64, 12, 2, 0.001)):
        rows = _rand_vecs(rng, 150, dim, scale)
        df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<float>")
        ar = sorted(map(tuple, clustering.kmeans_assign(
            df, k=k, n_iter=n_iter,
            centroid_strategy="arrow").collect()))
        lit = sorted(map(tuple, clustering.kmeans_assign(
            df, k=k, n_iter=n_iter,
            centroid_strategy="literal").collect()))
        assert ar == lit, (dim, k)


def test_semantic_dedup_random_boundary_sweep(spark):
    """Random vectors SCALED so many pairwise cosines land close to
    the threshold (pairs of near-identical vectors mixed with noise),
    vectorized cell path vs the r5 pair join."""
    from historicaldatadocumentparsersystem_spark.operators import clustering
    rng = random.Random("r6-semdedup-sweep")
    rows = []
    base = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(30)]
    i = 0
    for b in base:
        for _ in range(5):      # 5 jittered copies per base vector
            rows.append((i, [float(x + rng.uniform(-0.4, 0.4))
                             for x in b]))
            i += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    for thr in (0.35, 0.8, 0.999, -0.2):
        new = sorted(map(tuple, clustering.semantic_dedup(
            df, k=4, n_iter=2, threshold=thr).collect()))
        old = sorted(map(tuple, clustering._semantic_dedup_pairjoin(
            df, k=4, n_iter=2, threshold=thr).collect()))
        assert new == old, thr


def test_lsh_signatures_random_sweep(spark):
    from historicaldatadocumentparsersystem_spark.operators import similarity
    rng = random.Random("r6-lsh-sweep")
    rows = _rand_vecs(rng, 300, 32, 10.0) \
        + [(1000 + i, [0.0] * 32) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    tables = [similarity.make_planes(32, 6, 7 + t) for t in range(3)]
    sig_arr = F.array(*[similarity.hyperplane_signature("embedding", p)
                        for p in tables])
    old = sorted(map(tuple, df.select(
        "vec_id", F.posexplode(sig_arr).alias("t", "sig")).collect()))
    new = sorted(map(tuple, similarity._signatures_arrow(
        df, "vec_id", "embedding", tables)
        .select("vec_id", "t", "sig").collect()))
    assert new == old


def test_quality_classifier_random_text_sweep(spark):
    from historicaldatadocumentparsersystem_spark.operators import quality
    rng = random.Random("r6-quality-sweep")
    alphabet = ("abcdefghij ABCDE  \t\n\x0b\x0c\r"
                "éüßΣσς世界\U0001F600 0123.,;!?-_")
    rows = []
    for i in range(200):
        n = rng.randrange(0, 300)
        rows.append((i, "".join(rng.choice(alphabet) for _ in range(n))))
    rows += [(900, None), (901, ""), (902, " \t "), (903, "x" * 4000)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    new = sorted(map(tuple, quality.quality_classifier(df).collect()))
    old = sorted(map(tuple,
                     quality._quality_classifier_expr(df).collect()))
    assert new == old


def test_trigram_top2_random_text_sweep(spark):
    from historicaldatadocumentparsersystem_spark.operators import textstats
    rng = random.Random("r6-trigram-sweep")
    frags = ["the ", "and ", "der ", "und ", "le ", "est ", "los ",
             "que ", "ΣΟΦ", "世界", "\U0001F600 ", "  ", "x", "É"]
    rows = []
    for i in range(250):
        rows.append((i, "".join(rng.choice(frags)
                                for _ in range(rng.randrange(0, 120)))))
    rows += [(900, None), (901, ""), (902, "ab")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    new = sorted(map(tuple, textstats._trigram_top2(
        df, "text", "doc_id", 256).collect()))
    old = sorted(map(tuple, textstats._trigram_top2_r5(
        df, "text", "doc_id", 256).collect()))
    assert new == old


def test_round9_nano_random_sweep():
    """Vectorized round9 vs the Decimal reference on random doubles
    across magnitudes, plus exact .5-boundary nano grid points."""
    import decimal
    import numpy as np
    from historicaldatadocumentparsersystem_spark.operators import clustering
    rng = random.Random("r6-round9-sweep")
    vals = []
    for _ in range(4000):
        mag = 10 ** rng.uniform(-12, 9)
        vals.append(rng.uniform(-1, 1) * mag)
    # exact half-up boundaries at the nano grid
    vals += [k * 1e-9 + 5e-10 for k in range(-5, 5)]
    vals += [float(np.float32(v)) for v in vals[:500]]
    arr = np.array([vals])
    nano = clustering._np_round9_nano(arr)[0]
    for v, n in zip(vals, nano.tolist()):
        want = decimal.Decimal(repr(float(v))).quantize(
            decimal.Decimal("1e-9"), rounding=decimal.ROUND_HALF_UP)
        assert int(want.scaleb(9)) == n, (v, n, want)
