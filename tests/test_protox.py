"""Protobuf census family: wire vectors, classifier rules, golden
pin, Spark parity, fuzz."""

import random

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import \
    protox

GOLDEN = "fixtures/golden_protobuf_seed42_n8.parquet"
COLS = ["path", "field_no", "wire_type", "kind", "n", "bytes_total"]


def test_wire_vectors():
    # field 1 varint 150 (the spec's own example: 08 96 01)
    d = protox.parse_protobuf(b"\x08\x96\x01")
    assert d["ok"] and d["fields"] == \
        [("", 1, "varint", "varint", 1, 2)]
    # field 2 string "testing" (12 07 ...)
    d = protox.parse_protobuf(b"\x12\x07testing")
    assert d["fields"] == [("", 2, "len", "str", 1, 7)]
    # rejects: group markers, field 0, trailing garbage, empty
    for bad in (b"\x0b", b"\x00\x01", b"\x08\x96", b"",
                b"\x08\x01\xff"):
        assert not protox.parse_protobuf(bad)["ok"], bad


def test_classifier_and_paths():
    by = {r["url"].rsplit("/", 1)[1]:
          protox.parse_protobuf(r["payload"])
          for r in fixtures.protobuf_blob_rows()}
    resp = {(f[0], f[1]): f[3] for f in
            by["response.pb"]["fields"]}
    assert resp[("", 2)] == "msg" and resp[("", 3)] == "str"
    assert resp[("", 9)] == "bytes"       # invalid utf-8
    assert resp[("2.4", 1)] == "i64"      # nested doubles
    # repeated submessages aggregate (n=2)
    two = [f for f in by["response.pb"]["fields"]
           if f[:2] == ("", 2)][0]
    assert two[4] == 2
    # depth cap: the chain bottoms out at path depth 6
    paths = [f[0] for f in by["deep.pb"]["fields"]]
    assert "7.6.5.4.3.2" in paths
    assert max(p.count(".") for p in paths) == 5
    # non-protobuf inputs
    for name in ("empty.pb", "junk.pb", "group.pb", "text.txt"):
        assert not by[name]["ok"] and by[name]["fields"] == []


def _pure() -> list[tuple]:
    out = []
    for r in fixtures.protobuf_blob_rows():
        for t in protox.parse_protobuf(r["payload"])["fields"]:
            out.append((r["url"],) + t)
    return out


def test_match_committed_golden():
    got = [(r["url"],) + tuple(r[c] for c in COLS)
           for r in pq.read_table(GOLDEN).to_pylist()]
    assert got == _pure() and len(got) == 25


def test_spark_reader_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    df = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.protobuf_blob_rows()],
        "url string, payload binary").repartition(8)
    got = sorted(tuple(r) for r in
                 sources.read_protobuf_census(df).collect())
    assert got == sorted(_pure())


def test_fuzz_never_raises():
    rng = random.Random(59)
    for _ in range(300):
        blob = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(0, 150)))
        d = protox.parse_protobuf(blob)
        assert isinstance(d["fields"], list)
        assert d["ok"] == bool(d["fields"])
