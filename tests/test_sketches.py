"""HyperLogLog sketch: accuracy, merge associativity, determinism."""

from pyspark.sql import functions as F

from historicaldatadocumentparsersystem_spark.operators import sketches


def _keys(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("https://h/"), F.col("id")).alias("url"))


def test_hll_accuracy_within_bound(spark):
    true_n = 20_000
    est = sketches.hll_distinct(_keys(spark, 0, true_n), "url",
                                b=8).collect()[0]["estimate"]
    # 3 sigma of the 1.04/sqrt(m) standard error (6.5% at b=8)
    assert abs(est - true_n) / true_n < 3 * sketches.hll_error_bound(8)


def test_hll_small_range_linear_counting(spark):
    est = sketches.hll_distinct(_keys(spark, 0, 30), "url",
                                b=8).collect()[0]["estimate"]
    assert abs(est - 30) <= 3    # linear counting is near-exact here


def test_hll_merge_is_groupby_max(spark):
    """Register tables from two shards merged by union+max equal the
    sketch of the union — the cross-crawl at-rest contract."""
    a = sketches.hll_registers(_keys(spark, 0, 5_000), "url")
    b = sketches.hll_registers(_keys(spark, 2_500, 7_500), "url")
    merged = (a.union(b).groupBy("bucket")
              .agg(F.max("max_rho").alias("max_rho")))
    direct = sketches.hll_registers(_keys(spark, 0, 7_500), "url")
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, direct.collect()))
    # and the estimates (not just registers) agree
    e1 = sketches.hll_estimate(merged).collect()[0]["estimate"]
    e2 = sketches.hll_estimate(direct).collect()[0]["estimate"]
    assert e1 == e2


def test_hll_duplicates_are_free(spark):
    """Cardinality, not count: replicating every key 10x must not move
    the estimate at all."""
    once = sketches.hll_distinct(_keys(spark, 0, 1_000), "url")
    many = sketches.hll_distinct(
        _keys(spark, 0, 1_000).crossJoin(spark.range(10)), "url")
    assert once.collect() == many.collect()
