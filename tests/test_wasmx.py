"""WASM family: LEB128 + section vectors, golden pin, Spark parity,
fuzz (random bytes + corrupted real modules)."""

import random

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import wasmx

GOLDEN = "fixtures/golden_wasm_seed42_n12.parquet"
COLS = ["pos", "row_kind", "sec_id", "name", "module", "sym_kind",
        "sym_index", "size", "n_items"]


def test_uleb_vectors():
    assert wasmx._uleb(b"\x00", 0, 1) == (0, 1)
    assert wasmx._uleb(b"\x7f", 0, 1) == (127, 1)
    assert wasmx._uleb(b"\x80\x01", 0, 2) == (128, 2)
    assert wasmx._uleb(b"\xe5\x8e\x26", 0, 3) == (624485, 3)
    for bad in (b"", b"\x80", b"\xff" * 11):
        try:
            wasmx._uleb(bad, 0, len(bad))
            assert False, bad
        except ValueError:
            pass


def test_parse_shapes():
    by = {}
    for r in fixtures.wasm_module_rows(12):
        name = r["url"].rsplit("/", 1)[1]
        by[name] = wasmx.parse_wasm(r["payload"])
    d = by["mod-0.wasm"]
    assert [s[2] for s in d["sections"]] == \
        ["type", "function", "memory", "export", "code"]
    assert ("memory", "memory", 0) in \
        [(e[1], e[2], e[3]) for e in d["exports"]]
    # all four import kinds decode (limits with and without max)
    kinds = {i[3] for i in by["mod-1.wasm"]["imports"]}
    assert kinds == {"func", "table", "memory", "global"}
    assert by["mod-1.wasm"]["imports"][0][1:] == \
        ("env", "log", "func")
    # custom sections surface by name
    customs = [s[2] for s in by["mod-2.wasm"]["sections"]
               if s[1] == 0]
    assert customs == ["custom:name", "custom:producers"]
    assert any(s[2] == "custom:sourceMappingURL"
               for s in by["mod-3.wasm"]["sections"])
    # truncation keeps the valid prefix, drops the cut section
    assert [s[2] for s in by["mod-4.wasm"]["sections"]] == \
        ["type", "export"]
    assert by["mod-4.wasm"]["exports"][0][1] == "partial"
    # junk yields nothing
    assert by["mod-5.wasm"]["version"] is None
    assert by["mod-5.wasm"]["sections"] == []
    # big function vector: counts, not bodies
    assert by["mod-6.wasm"]["sections"][1][4] == 51


def _pure() -> list[tuple]:
    out = []
    for r in fixtures.wasm_module_rows(12):
        d = wasmx.parse_wasm(r["payload"])
        for (pos, sid, sname, size, n_items) in d["sections"]:
            out.append((r["url"], pos, "section", sid, sname,
                        None, None, None, size, n_items))
        for (pos, mod, fld, kind) in d["imports"]:
            out.append((r["url"], pos, "import", None, fld, mod,
                        kind, None, None, None))
        for (pos, nm, kind, idx) in d["exports"]:
            out.append((r["url"], pos, "export", None, nm, None,
                        kind, idx, None, None))
    return out


def test_match_committed_golden():
    got = [(r["url"],) + tuple(r[c] for c in COLS)
           for r in pq.read_table(GOLDEN).to_pylist()]
    assert got == _pure() and len(got) == 64


def test_spark_reader_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    df = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.wasm_module_rows(12)],
        "url string, payload binary").repartition(8)
    got = sorted(tuple(r) for r in
                 sources.read_wasm_modules(df).collect())
    assert got == sorted(_pure())


def test_fuzz_never_raises():
    rng = random.Random(53)
    real = [r["payload"] for r in fixtures.wasm_module_rows(12)
            if len(r["payload"]) > 20]
    for _ in range(150):
        blob = b"\x00asm" + bytes(
            rng.randrange(256)
            for _ in range(rng.randrange(0, 120)))
        d = wasmx.parse_wasm(blob)
        assert isinstance(d["sections"], list)
    for _ in range(80):
        base = bytearray(real[rng.randrange(len(real))])
        for _ in range(rng.randrange(1, 10)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        d = wasmx.parse_wasm(bytes(base[:rng.randrange(
            0, len(base) + 1)]))
        assert isinstance(d["sections"], list)


def test_vector_count_clamp():
    """a declared vector count past int32 -> NULL n_items (review
    regression); the section row itself survives."""
    hdr = b"\x00asm" + (1).to_bytes(4, "little")
    # type section claiming 2^31 entries (5-byte uleb, no backing)
    count = b"\x80\x80\x80\x80\x08"
    blob = hdr + bytes([1]) + bytes([len(count)]) + count
    d = wasmx.parse_wasm(blob)
    assert d["sections"][0][2] == "type"
    assert d["sections"][0][4] is None
