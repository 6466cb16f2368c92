"""PE + Mach-O families: header/import vectors, fat-binary slices,
golden pins, Spark parity, fuzz."""

import random

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import \
    machox, pex

PE_GOLDEN = "fixtures/golden_pe_seed42_n5.parquet"
MACHO_GOLDEN = "fixtures/golden_macho_seed42_n5.parquet"
PE_COLS = ["pos", "row_kind", "machine", "kind", "is_dll",
           "n_sections", "pe_timestamp", "name", "vsize", "rva",
           "rawsize", "flags", "import_dll"]
MACHO_COLS = ["pos", "row_kind", "fat", "slice_no", "arch", "cpu",
              "bits", "endian", "filetype", "name", "nsects",
              "link_kind"]


def test_pe_shapes():
    by = {r["url"].rsplit("/", 1)[1]: pex.parse_pe(r["payload"])
          for r in fixtures.pe_file_rows()}
    dll = by["helper.dll"]
    assert (dll["machine"], dll["kind"], dll["is_dll"]) == \
        ("x86_64", "pe32+", True)
    assert dll["timestamp"] == 1730000000
    # imports resolved through the RVA -> file-offset map
    assert dll["imports"] == ["KERNEL32.dll", "ws2_32.dll",
                              "ADVAPI32.dll"]
    secs = {s[1]: s for s in dll["sections"]}
    assert secs[".text"][6] == "XR" and secs[".idata"][6] == "R"
    exe = by["setup.exe"]
    assert (exe["kind"], exe["is_dll"], exe["imports"]) == \
        ("pe32", False, ["USER32.dll"])
    # MZ without a PE header is not a PE
    assert by["dosonly.exe"]["kind"] is None
    # truncation: headers parse, import data unreachable
    tr = by["trunc.dll"]
    assert tr["kind"] == "pe32+" and tr["imports"] == []
    assert by["junk.bin"]["kind"] is None


def test_macho_shapes():
    by = {r["url"].rsplit("/", 1)[1]:
          machox.parse_macho(r["payload"])
          for r in fixtures.macho_file_rows()}
    d = by["libdemo.dylib"]
    assert d["fat"] is False
    assert d["slices"][0][2:6] == ("arm64", 64, "le", "dylib")
    assert [(s[2], s[3]) for s in d["segments"]] == \
        [("__TEXT", 2), ("__DATA", 1)]
    assert [(x[2], x[3]) for x in d["dylibs"]] == [
        ("id", "@rpath/libdemo.dylib"),
        ("load", "/usr/lib/libSystem.B.dylib"),
        ("load", "/usr/lib/libc++.1.dylib")]
    # 32-bit big-endian through the same walk
    t = by["tool32"]
    assert t["slices"][0][2:6] == ("x86", 32, "be", "execute")
    # fat binary: both slices, rows tagged with their slice index
    u = by["universal"]
    assert u["fat"] and len(u["slices"]) == 2
    assert {s[1] for s in u["slices"]} == {"arm64", "x86"}
    assert (3, 1, "load", "/usr/lib/libSystem.B.dylib") in \
        u["dylibs"]
    # Java class files share the fat magic but have huge "counts"
    assert by["Hello.class"]["fat"] is None
    assert by["junk.bin"]["fat"] is None


def _pure_pe() -> list[tuple]:
    out = []
    for r in fixtures.pe_file_rows():
        d = pex.parse_pe(r["payload"])
        if d["kind"] is None:
            continue
        base = (d["machine"], d["kind"], d["is_dll"],
                d["n_sections"], d["timestamp"])
        out.append((r["url"], 0, "file") + base + (None,) * 6)
        for (pos, name, vsize, rva, rawsize, _ro, flags) in \
                d["sections"]:
            out.append((r["url"], pos, "section") + base
                       + (name, vsize, rva, rawsize, flags, None))
        for i, dll in enumerate(d["imports"]):
            out.append((r["url"], i, "import") + base
                       + (None, None, None, None, None, dll))
    return out


def _pure_macho() -> list[tuple]:
    out = []
    for r in fixtures.macho_file_rows():
        d = machox.parse_macho(r["payload"])
        if d["fat"] is None:
            continue
        for (pos, arch, cpu, bits, endian, ft, _nc) in \
                d["slices"]:
            out.append((r["url"], pos, "slice", d["fat"], pos,
                        arch, cpu, bits, endian, ft, None, None,
                        None))
        for (pos, sl, name, nsects) in d["segments"]:
            out.append((r["url"], pos, "segment", d["fat"], sl,
                        None, None, None, None, None, name,
                        nsects, None))
        for (pos, sl, kind, name) in d["dylibs"]:
            out.append((r["url"], pos, "dylib", d["fat"], sl,
                        None, None, None, None, None, name, None,
                        kind))
    return out


def test_match_committed_goldens():
    got = [(r["url"],) + tuple(r[c] for c in PE_COLS)
           for r in pq.read_table(PE_GOLDEN).to_pylist()]
    assert got == _pure_pe() and len(got) == 13
    got = [(r["url"],) + tuple(r[c] for c in MACHO_COLS)
           for r in pq.read_table(MACHO_GOLDEN).to_pylist()]
    assert got == _pure_macho() and len(got) == 18


def test_spark_readers_match_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    df = spark.createDataFrame(
        [(r["url"], r["payload"]) for r in fixtures.pe_file_rows()],
        "url string, payload binary").repartition(4)
    got = sorted(tuple(r) for r in
                 sources.read_pe_objects(df).collect())
    assert got == sorted(_pure_pe())
    df = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.macho_file_rows()],
        "url string, payload binary").repartition(4)
    got = sorted(tuple(r) for r in
                 sources.read_macho_objects(df).collect())
    assert got == sorted(_pure_macho())


def test_fuzz_never_raises():
    rng = random.Random(65)
    pe_real = [r["payload"] for r in fixtures.pe_file_rows()
               if len(r["payload"]) > 100]
    mo_real = [r["payload"] for r in fixtures.macho_file_rows()
               if len(r["payload"]) > 40]
    for _ in range(120):
        blob = b"MZ" + bytes(rng.randrange(256)
                             for _ in range(rng.randrange(0, 300)))
        assert isinstance(pex.parse_pe(blob)["sections"], list)
        blob = (b"\xcf\xfa\xed\xfe", b"\xca\xfe\xba\xbe")[
            rng.randrange(2)] + bytes(
            rng.randrange(256)
            for _ in range(rng.randrange(0, 200)))
        assert isinstance(
            machox.parse_macho(blob)["slices"], list)
    for _ in range(60):
        base = bytearray(pe_real[rng.randrange(len(pe_real))])
        for _ in range(rng.randrange(1, 16)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        assert isinstance(pex.parse_pe(
            bytes(base[:rng.randrange(0, len(base) + 1)])
        )["sections"], list)
        base = bytearray(mo_real[rng.randrange(len(mo_real))])
        for _ in range(rng.randrange(1, 12)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        assert isinstance(machox.parse_macho(
            bytes(base[:rng.randrange(0, len(base) + 1)])
        )["slices"], list)
