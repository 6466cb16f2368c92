"""ELF family: both classes/byte orders, DT_NEEDED resolution,
golden pin, Spark parity, fuzz."""

import random

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import elfx

GOLDEN = "fixtures/golden_elf_seed42_n6.parquet"
COLS = ["pos", "row_kind", "cls", "endian", "etype", "machine",
        "entry", "name", "stype", "flags", "offset", "size", "lib"]


def _by_name():
    return {r["url"].rsplit("/", 1)[1]:
            elfx.parse_elf(r["payload"])
            for r in fixtures.elf_object_rows()}


def test_headers_sections_deps():
    by = _by_name()
    so = by["libdemo.so"]
    assert (so["cls"], so["endian"], so["etype"], so["machine"]) \
        == (64, "le", "dyn", "x86_64")
    secs = {s[1]: s for s in so["sections"]}
    assert secs[".text"][3] == "AX" and secs[".data"][3] == "WA"
    assert secs[".dynamic"][2] == "dynamic"
    # DT_NEEDED resolved through sh_link's strtab; walk stops at
    # DT_NULL so the unreferenced libssl string is NOT a dep
    assert so["needed"] == ["libc.so.6", "libm.so.6"]
    # 32-bit big-endian decodes through the same layout table
    t = by["tool"]
    assert (t["cls"], t["endian"], t["etype"], t["machine"],
            t["entry"]) == (32, "be", "exec", "arm", 0x8000)
    assert [s[1] for s in t["sections"]][1:] == \
        [".text", ".rodata", ".note", ".shstrtab"]
    assert by["mod.o"]["machine"] == "aarch64"
    # sectionless core: header only
    c = by["crash.core"]
    assert c["etype"] == "core" and c["sections"] == []
    # truncation keeps parseable headers, names degrade to ''
    tr = by["trunc.so"]
    assert len(tr["sections"]) == 5 and tr["needed"] == []
    assert by["junk.bin"]["cls"] is None


def _pure() -> list[tuple]:
    out = []
    for r in fixtures.elf_object_rows():
        d = elfx.parse_elf(r["payload"])
        if d["cls"] is None:
            continue
        base = (d["cls"], d["endian"], d["etype"], d["machine"],
                d["entry"])
        out.append((r["url"], 0, "file") + base + (None,) * 6)
        for (pos, name, stype, flags, off, size) in d["sections"]:
            out.append((r["url"], pos, "section") + base
                       + (name, stype, flags, off, size, None))
        for i, lib in enumerate(d["needed"]):
            out.append((r["url"], i, "needed") + base
                       + (None, None, None, None, None, lib))
    return out


def test_match_committed_golden():
    got = [(r["url"],) + tuple(r[c] for c in COLS)
           for r in pq.read_table(GOLDEN).to_pylist()]
    assert got == _pure() and len(got) == 28


def test_spark_reader_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    df = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.elf_object_rows()],
        "url string, payload binary").repartition(8)
    got = sorted(tuple(r) for r in
                 sources.read_elf_objects(df).collect())
    assert got == sorted(_pure())


def test_fuzz_never_raises():
    rng = random.Random(60)
    real = [r["payload"] for r in fixtures.elf_object_rows()
            if len(r["payload"]) > 60]
    for _ in range(150):
        blob = b"\x7fELF" + bytes(
            rng.randrange(256)
            for _ in range(rng.randrange(0, 250)))
        assert isinstance(elfx.parse_elf(blob)["sections"], list)
    for _ in range(100):
        base = bytearray(real[rng.randrange(len(real))])
        for _ in range(rng.randrange(1, 16)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        d = elfx.parse_elf(bytes(base[:rng.randrange(
            0, len(base) + 1)]))
        assert isinstance(d["sections"], list)


def test_kernel_space_entry_clamp():
    """u64 entry/offset/size fields >= 2^63 (real in kernel
    images) surface NULL instead of crashing the Int64 column
    (review regression)."""
    base = bytearray(fixtures.elf_object_rows()[0]["payload"])
    base[24:32] = (0xFFFFFFFF80100000).to_bytes(8, "little")
    d = elfx.parse_elf(bytes(base))
    assert d["entry"] is None and d["sections"]  # rest parses
