"""Pointer-doubling thread reconstruction: semantics, isolation,
convergence raise, and parity with the recursive-CTE oracle (run by
test_entry_oracle for the registered queries)."""

import pytest

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.operators import \
    threads


def _df(spark, rows):
    return spark.createDataFrame(
        [(r["url"], r["message_id"], r["in_reply_to"])
         for r in rows],
        "url string, message_id string, in_reply_to string"
    ).repartition(4)


def test_semantics(spark):
    got = {(r.part, r.id): (r.root_id, r.depth)
           for r in threads.thread_roots(
               _df(spark, fixtures.thread_msg_rows())).collect()}
    a = "https://lists.example.org/a"
    b = "https://lists.example.org/b"
    c = "https://lists.example.org/c"
    d = "https://lists.example.org/d"
    # depth-9 chain all resolves to m0
    for j in range(10):
        assert got[(a, f"m{j}")] == ("m0", j)
    # forked tree: two roots in one archive
    assert got[(b, "g1")] == ("r", 2)
    assert got[(b, "g3")] == ("r", 2)
    assert got[(b, "c2")] == ("r", 1)
    assert got[(b, "r2c")] == ("r2", 1)
    assert got[(b, "r")] == ("r", 0)
    assert (b, "") not in got          # empty ids dropped
    # dangling parent: x1 becomes the root of the truncated thread
    assert got[(c, "x1")] == ("x1", 0)
    assert got[(c, "x2")] == ("x1", 1)
    # partition isolation: archive D reuses A's ids, different roots
    assert got[(d, "m1")] == ("m2", 2)
    assert got[(d, "m0")] == ("m2", 1)
    assert len(got) == 23  # 10 + 8 (empty id dropped) + 2 + 3


def test_doubling_needs_log_rounds(spark):
    # depth 9 resolves within 4 doubling rounds; 2 rounds (compress
    # to distance 4) must RAISE, not return partial ancestors
    chain = fixtures.thread_msg_rows()[:10]
    assert threads.thread_roots(_df(spark, chain), max_iter=5) \
        .count() == 10
    with pytest.raises(RuntimeError, match="not converged"):
        threads.thread_roots(_df(spark, chain),
                             max_iter=2).collect()


def test_cycle_raises(spark):
    rows = [{"url": "u", "message_id": x, "in_reply_to": y}
            for x, y in [("a", "b"), ("b", "c"), ("c", "a")]]
    with pytest.raises(RuntimeError, match="not converged"):
        threads.thread_roots(_df(spark, rows), max_iter=6).collect()


def test_profile(spark):
    prof = {(r.part, r.root_id): (r.n_messages, r.max_depth)
            for r in threads.thread_profile(
                _df(spark, fixtures.thread_msg_rows())).collect()}
    assert prof[("https://lists.example.org/a", "m0")] == (10, 9)
    assert prof[("https://lists.example.org/b", "r")] == (6, 2)
    assert prof[("https://lists.example.org/b", "r2")] == (2, 1)
    assert prof[("https://lists.example.org/c", "x1")] == (2, 1)
