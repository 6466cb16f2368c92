"""MessagePack family: spec vectors, timestamp extension widths,
whole-buffer rule, golden pin, Spark parity, fuzz."""

import random
import struct

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import msgpackx

GOLDEN = "fixtures/golden_msgpack_seed42_n10.parquet"


def _one(blob):
    d = msgpackx.parse_msgpack(blob)
    assert d["ok"], blob
    return d["rows"]


def test_scalar_vectors():
    # fixint bounds, widths, negative fixint
    assert _one(b"\x7f") == [(0, "", "int", "127")]
    assert _one(b"\xe0") == [(0, "", "int", "-32")]
    assert _one(b"\xcc\xff") == [(0, "", "int", "255")]
    assert _one(b"\xcf" + b"\xff" * 8) == [
        (0, "", "int", str((1 << 64) - 1))]
    assert _one(b"\xd0\x80") == [(0, "", "int", "-128")]
    assert _one(b"\xc0") == [(0, "", "null", "")]
    assert _one(b"\xc3") == [(0, "", "bool", "true")]
    assert _one(b"\xcb" + struct.pack(">d", 2.5)) == [
        (0, "", "float", "2.5")]
    # float32 renders the exact binary value
    assert _one(b"\xca" + struct.pack(">f", 0.1))[0][3] == \
        repr(struct.unpack(">f", struct.pack(">f", 0.1))[0])
    assert _one(b"\xa3abc") == [(0, "", "str", "abc")]


def test_container_paths_and_keys():
    rows = _one(msgpackx.encode_msgpack(
        {"a": [1, {"b": 2}], "white space": 3}))
    assert rows == [
        (0, "a[0]", "int", "1"),
        (1, "a[1].b", "int", "2"),
        (2, '"white space"', "int", "3"),
    ]
    # int keys render bare; empty containers emit their own row
    assert _one(b"\x81\x05\xc2") == [(0, "5", "bool", "false")]
    assert _one(b"\x90") == [(0, "", "array", "")]
    assert _one(b"\x80") == [(0, "", "map", "")]


def test_timestamp_widths():
    assert _one(b"\xd6\xff" + struct.pack(">I", 1700000000)) == [
        (0, "", "timestamp", "1700000000")]
    v64 = (500_000_000 << 34) | 1700000000
    assert _one(b"\xd7\xff" + struct.pack(">Q", v64)) == [
        (0, "", "timestamp", "1700000000.500000000")]
    assert _one(b"\xc7\x0c\xff"
                + struct.pack(">Iq", 123456789, -86400)) == [
        (0, "", "timestamp", "-86400.123456789")]
    # invalid nanos reject the whole item
    bad = (1_050_000_000 << 34) | 1   # 30-bit field, > 999999999
    assert not msgpackx.parse_msgpack(
        b"\xd7\xff" + struct.pack(">Q", bad))["ok"]


def test_rejects():
    for blob in (b"\xc1",                        # never-used byte
                 msgpackx.encode_msgpack(1) + b"\x00",  # trailing
                 b"\xa5ab",                      # truncated str
                 b"\x91",                        # truncated array
                 b"",):
        assert not msgpackx.parse_msgpack(blob)["ok"]
    deep = [1]
    for _ in range(30):
        deep = [deep]
    assert not msgpackx.parse_msgpack(
        msgpackx.encode_msgpack(deep))["ok"]


def _pure():
    out = []
    for r in fixtures.msgpack_blob_rows():
        d = msgpackx.parse_msgpack(r["payload"])
        if not d["ok"]:
            out.append((r["url"], 0, False, None, None, None))
            continue
        for (pos, path, vtype, text) in d["rows"]:
            out.append((r["url"], pos, True, path, vtype, text))
    return out


def test_match_committed_golden():
    got = [tuple(r.values())
           for r in pq.read_table(GOLDEN).to_pylist()]
    assert got == _pure() and len(got) == 39


def test_spark_reader_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    df = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.msgpack_blob_rows()],
        "url string, payload binary").repartition(4)
    got = sorted((tuple(r) for r in
                  sources.read_msgpack_records(df).collect()),
                 key=str)
    assert got == sorted(_pure(), key=str)


def test_fuzz_never_raises():
    rng = random.Random(66)
    real = [r["payload"] for r in fixtures.msgpack_blob_rows()
            if len(r["payload"]) > 4]
    for _ in range(300):
        blob = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(0, 60)))
        assert isinstance(
            msgpackx.parse_msgpack(blob)["rows"], list)
    for _ in range(100):
        base = bytearray(real[rng.randrange(len(real))])
        for _ in range(rng.randrange(1, 6)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        msgpackx.parse_msgpack(
            bytes(base[:rng.randrange(0, len(base) + 1)]))
