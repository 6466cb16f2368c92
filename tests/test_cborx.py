"""CBOR family: RFC 8949 vectors, indefinite forms, tag labels,
golden pin, Spark parity, fuzz."""

import random

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import cborx

GOLDEN = "fixtures/golden_cbor_seed42_n10.parquet"
COLS = ["pos", "ok", "path", "vtype", "value_text"]


def _one(blob):
    d = cborx.parse_cbor(blob)
    assert d["ok"], blob
    return d["rows"]


def test_rfc_vectors():
    # Appendix A style: ints, strings, arrays, floats
    assert _one(b"\x00") == [(0, "", "int", "0")]
    assert _one(b"\x17") == [(0, "", "int", "23")]
    assert _one(b"\x18\x64") == [(0, "", "int", "100")]
    assert _one(b"\x39\x03\xe7") == [(0, "", "int", "-1000")]
    assert _one(b"\x1b\x00\x00\x00\xe8\xd4\xa5\x10\x00") == \
        [(0, "", "int", "1000000000000")]
    assert _one(b"\x64\x49\x45\x54\x46") == \
        [(0, "", "tstr", "IETF")]
    assert _one(b"\xf9\x3c\x00") == [(0, "", "float", "1.0")]
    assert _one(b"\xf9\x7c\x00") == [(0, "", "float", "inf")]
    assert _one(b"\x82\x01\x02") == \
        [(0, "[0]", "int", "1"), (1, "[1]", "int", "2")]
    # rejects: reserved ai, truncation, trailing, empty
    for bad in (b"", b"\x1c", b"\x18", b"\x62a", b"\x00\x00",
                b"\xff"):
        assert not cborx.parse_cbor(bad)["ok"], bad


def test_fixture_shapes():
    by = {r["url"].rsplit("/", 1)[1]:
          cborx.parse_cbor(r["payload"])
          for r in fixtures.cbor_blob_rows()}
    rows = {t[1]: t for t in by["webauthn.cbor"]["rows"]}
    assert rows["attStmt.alg"][2:] == ("int", "-7")
    assert rows["authData"][3] == "bytes:40"
    # negative integer map keys render into paths
    assert [t[1] for t in by["cosekey.cbor"]["rows"]] == \
        ["1", "3", "-1", "-2", "-3"]
    # tags ride the vtype, nested tags accumulate
    tag = {t[1]: t[2] for t in by["tagged.cbor"]["rows"]}
    assert tag["epoch"] == "int@tag1"
    assert tag["nested"] == "int@tag42@tag1"
    # indefinite chunks join; indefinite array/map walk
    ind = {t[1]: t[3] for t in by["indefinite.cbor"]["rows"]}
    assert ind["parts"] == "hello" and ind["blob"] == "h'000102'"
    assert ind["seq[1]"] == "x"
    # half and single floats decode exactly
    fl = [t[3] for t in by["floats.cbor"]["rows"]]
    assert fl == ["1.5", "0.5"]
    # empty containers surface as rows
    mx = {t[1]: t[2] for t in by["mixed.cbor"]["rows"]}
    assert mx["[3].empty_a"] == "array"
    assert mx["[3].empty_m"] == "map"
    for bad in ("trailing.cbor", "trunc.cbor", "junk.bin",
                "badutf8.cbor"):
        assert not by[bad]["ok"]


def _pure() -> list[tuple]:
    out = []
    for r in fixtures.cbor_blob_rows():
        d = cborx.parse_cbor(r["payload"])
        if not d["ok"]:
            out.append((r["url"], 0, False, None, None, None))
            continue
        for (pos, path, vtype, text) in d["rows"]:
            out.append((r["url"], pos, True, path, vtype, text))
    return out


def test_match_committed_golden():
    got = [(r["url"],) + tuple(r[c] for c in COLS)
           for r in pq.read_table(GOLDEN).to_pylist()]
    assert got == _pure() and len(got) == 32


def test_spark_reader_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    df = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.cbor_blob_rows()],
        "url string, payload binary").repartition(8)
    got = sorted(tuple(r) for r in
                 sources.read_cbor_records(df).collect())
    assert got == sorted(_pure())


def test_fuzz_never_raises():
    rng = random.Random(63)
    real = [r["payload"] for r in fixtures.cbor_blob_rows()
            if len(r["payload"]) > 10]
    for _ in range(400):
        blob = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(0, 80)))
        assert isinstance(cborx.parse_cbor(blob)["ok"], bool)
    for _ in range(100):
        base = bytearray(real[rng.randrange(len(real))])
        for _ in range(rng.randrange(1, 8)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        d = cborx.parse_cbor(bytes(base[:rng.randrange(
            0, len(base) + 1)]))
        assert isinstance(d["ok"], bool)
