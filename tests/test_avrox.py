"""Avro family: zigzag vectors, schema shaping, sync discipline,
golden pin, Spark parity, fuzz."""

import random

import pyarrow.parquet as pq
import pytest

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import avrox

GOLDEN = "fixtures/golden_avro_seed42_n8.parquet"
COLS = ["pos", "row_kind", "codec", "schema_type", "schema_name",
        "sync_ok", "field_name", "field_type", "n_records", "size",
        "raw_size"]


def test_zigzag_vectors():
    # spec examples: 0->0, -1->1, 1->2, -2->3, 2->4
    for enc, val in ((b"\x00", 0), (b"\x01", -1), (b"\x02", 1),
                     (b"\x03", -2), (b"\x04", 2),
                     (b"\x80\x01", 64), (b"\x81\x01", -65)):
        assert avrox._zigzag(enc, 0) == (val, len(enc)), enc
    with pytest.raises(ValueError):
        avrox._zigzag(b"\x80", 0)


def test_schema_shapes():
    assert avrox._schema_shape("string") == ("string", None, [])
    st, name, fields = avrox._schema_shape(
        {"type": "record", "name": "R", "fields": [
            {"name": "a", "type": ["null", "long"]},
            {"name": "b", "type": {"type": "array",
                                   "items": "bytes"}}]})
    assert (st, name) == ("record", "R")
    assert fields == [("a", "null|long"), ("b", "array<bytes>")]


def _by_name():
    return {r["url"].rsplit("/", 1)[1]:
            avrox.parse_avro(r["payload"])
            for r in fixtures.avro_file_rows()}


def test_container_shapes():
    by = _by_name()
    p = by["plain.avro"]
    assert (p["codec"], p["schema_name"]) == ("null", "Fetch")
    assert [(b[1], b[2] == b[3]) for b in p["blocks"]] == \
        [(10, True), (5, True)]
    # deflate: real inflated sizes exceed on-disk sizes
    d = by["deflate.avro"]
    assert all(b[3] > b[2] for b in d["blocks"])
    assert sum(b[1] for b in d["blocks"]) == 43
    # split metadata map parses across chunks
    assert by["split.avro"]["schema_name"] == "Fetch"
    # non-record schema: type only, no fields
    s = by["strings.avro"]
    assert (s["schema_type"], s["fields"]) == ("string", [])
    # sync mismatch stops the walk, keeps verified blocks
    bs = by["badsync.avro"]
    assert bs["sync_ok"] is False and len(bs["blocks"]) == 1
    # truncation mid-block drops it cleanly
    assert by["trunc.avro"]["blocks"] == []
    assert by["junk.bin"]["codec"] is None
    # nested labels: union / array / map / named record
    types = dict((f[1], f[2]) for f in by["nested.avro"]["fields"])
    assert types == {"id": "long", "lang": "null|string",
                     "tags": "array<string>",
                     "hdrs": "map<string>", "geo": "Geo"}


def _pure() -> list[tuple]:
    out = []
    for r in fixtures.avro_file_rows():
        d = avrox.parse_avro(r["payload"])
        if d["codec"] is None:
            continue
        base = (d["codec"], d["schema_type"], d["schema_name"],
                d["sync_ok"])
        out.append((r["url"], 0, "file") + base + (None,) * 5)
        for (pos, fname, ftype) in d["fields"]:
            out.append((r["url"], pos, "field") + base
                       + (fname, ftype, None, None, None))
        for (pos, n_rec, size, raw) in d["blocks"]:
            out.append((r["url"], pos, "block") + base
                       + (None, None, n_rec, size, raw))
    return out


def test_match_committed_golden():
    got = [(r["url"],) + tuple(r[c] for c in COLS)
           for r in pq.read_table(GOLDEN).to_pylist()]
    assert got == _pure() and len(got) == 31


def test_spark_reader_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    df = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.avro_file_rows()],
        "url string, payload binary").repartition(8)
    got = sorted(tuple(r) for r in
                 sources.read_avro_containers(df).collect())
    assert got == sorted(_pure())


def test_fuzz_never_raises():
    rng = random.Random(58)
    real = [r["payload"] for r in fixtures.avro_file_rows()
            if len(r["payload"]) > 30]
    for _ in range(150):
        blob = b"Obj\x01" + bytes(
            rng.randrange(256)
            for _ in range(rng.randrange(0, 200)))
        assert isinstance(avrox.parse_avro(blob)["blocks"], list)
    for _ in range(80):
        base = bytearray(real[rng.randrange(len(real))])
        for _ in range(rng.randrange(1, 12)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        d = avrox.parse_avro(bytes(base[:rng.randrange(
            0, len(base) + 1)]))
        assert isinstance(d["blocks"], list)


def test_zigzag_int64_range():
    """a 10-byte varint decoding past int64 raises (Int64-column
    clamp, review regression) instead of emitting an overflow."""
    with pytest.raises(ValueError):
        avrox._zigzag(b"\x80" * 9 + b"\x7f", 0)


def test_deflate_bomb_counted_not_materialized():
    """ADVICE r4: a deflate-bomb block must report its TRUE inflated
    size in O(chunk) memory — chunk-counted via compx._count_stream,
    never materialized (the old len(zlib.decompress(...)) allocated
    the whole 64 MB)."""
    import tracemalloc
    import zlib as _z
    rows = fixtures.avro_file_rows()
    hdr = next(r["payload"] for r in rows
               if r["url"].endswith("deflate.avro"))
    # reuse the real deflate header; append one bomb block
    sync = bytes(range(16))
    bomb_raw_size = 64 << 20
    co = _z.compressobj(9, _z.DEFLATED, -15)
    comp = co.compress(b"\x00" * bomb_raw_size) + co.flush()
    assert len(comp) < 100_000            # ~1000x expansion

    def zz(v):
        u = (v << 1) ^ (v >> 63)
        out = bytearray()
        while True:
            c = u & 0x7F
            u >>= 7
            out.append(c | (0x80 if u else 0))
            if not u:
                return bytes(out)

    # header() ends with zz(0) + SYNC; find that boundary
    head_end = hdr.index(sync)
    blob = hdr[:head_end + 16] + zz(1) + zz(len(comp)) + comp + sync
    tracemalloc.start()
    d = avrox.parse_avro(blob)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert d["blocks"][0][3] == bomb_raw_size
    assert peak < 8 << 20                 # chunks, not the bomb


def test_deep_schema_and_json_never_raise():
    """ADVICE r4: RecursionError from json.loads (deep avro.schema
    metadata) and unbounded label() recursion are both handled."""
    import json as _json

    def zz(v):
        u = (v << 1) ^ (v >> 63)
        out = bytearray()
        while True:
            c = u & 0x7F
            u >>= 7
            out.append(c | (0x80 if u else 0))
            if not u:
                return bytes(out)

    def s(x: bytes) -> bytes:
        return zz(len(x)) + x

    sync = bytes(range(16))
    deep_json = b"[" * 5000 + b"]" * 5000   # C scanner RecursionError
    blob = (b"Obj\x01" + zz(2)
            + s(b"avro.schema") + s(deep_json)
            + s(b"avro.codec") + s(b"null")
            + zz(0) + sync)
    d = avrox.parse_avro(blob)              # must not raise
    assert d["schema_type"] is None and d["codec"] == "null"
    # deep nested array schema: label() caps at depth 6
    sch = "long"
    for _ in range(200):
        sch = {"type": "array", "items": sch}
    sch = {"type": "record", "name": "Deep",
           "fields": [{"name": "f", "type": sch}]}
    blob2 = (b"Obj\x01" + zz(2)
             + s(b"avro.schema")
             + s(_json.dumps(sch).encode())
             + s(b"avro.codec") + s(b"null")
             + zz(0) + sync)
    d2 = avrox.parse_avro(blob2)
    assert d2["schema_name"] == "Deep"
    assert d2["fields"][0][2].startswith("array<")
    assert "?" in d2["fields"][0][2]        # capped, not recursed
