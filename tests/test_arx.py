"""ar/.deb family: member table + long names, control composition,
Depends splitting, golden pin, Spark parity, fuzz."""

import random

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import arx

GOLDEN = "fixtures/golden_ar_seed42_n6.parquet"
COLS = ["pos", "row_kind", "kind", "name", "mtime", "mode",
        "size", "value", "dep_group", "dep_alt", "version_req"]


def test_split_depends_vectors():
    assert arx.split_depends(
        "libc6 (>= 2.34), zlib1g, python3:any") == [
        (0, 0, "libc6", ">= 2.34"), (1, 0, "zlib1g", None),
        (2, 0, "python3", None)]
    assert arx.split_depends("a | b (<< 2) | c") == [
        (0, 0, "a", None), (0, 1, "b", "<< 2"), (0, 2, "c", None)]
    assert arx.split_depends("") == []


def test_archives_and_deb_composition():
    by = {r["url"].rsplit("/", 1)[1]:
          arx.parse_ar(r["payload"])
          for r in fixtures.ar_archive_rows()}
    # GNU '//' long-name table resolved
    lib = by["libcrawl.a"]
    assert lib["kind"] == "ar"
    assert [m[1] for m in lib["members"]] == \
        ["crawl_fetch_module.o", "crawl_parse_module.o"]
    # gzip control: fields + constraint-split deps
    deb = by["warc-tools.deb"]
    assert deb["kind"] == "deb"
    assert deb["control"]["Package"] == "warc-tools"
    assert deb["control"]["Installed-Size"] == "2048"
    # multiline Description folds with its continuation
    assert "Long description" in deb["control"]["Description"]
    assert (0, 0, "libc6", ">= 2.34") in deb["depends"]
    # ':any' arch qualifier stripped
    assert (2, 0, "python3", None) in deb["depends"]
    # xz control + alternatives
    p = by["page-extractor.deb"]
    assert (0, 1, "python3-minimal", None) in p["depends"]
    assert (1, 1, "libxml2-compat", None) in p["depends"]
    # plain ar is not a deb
    assert by["plain.ar"]["kind"] == "ar"
    assert by["plain.ar"]["control"] is None
    # truncation: control member survives, data member dropped
    cut = by["cut.deb"]
    assert cut["kind"] == "deb" and len(cut["members"]) == 2
    assert by["junk.bin"]["kind"] is None


def _pure() -> list[tuple]:
    out = []
    for r in fixtures.ar_archive_rows():
        d = arx.parse_ar(r["payload"])
        if d["kind"] is None:
            continue
        for (pos, name, mtime, mode, size) in d["members"]:
            out.append((r["url"], pos, "member", d["kind"], name,
                        mtime, mode, size, None, None, None,
                        None))
        if d["control"]:
            for i, (k, v) in enumerate(d["control"].items()):
                out.append((r["url"], i, "field", d["kind"], k,
                            None, None, None, v, None, None,
                            None))
        for i, (g, a, nm, constraint) in enumerate(d["depends"]):
            out.append((r["url"], i, "dep", d["kind"], nm, None,
                        None, None, None, g, a, constraint))
    return out


def test_match_committed_golden():
    got = [(r["url"],) + tuple(r[c] for c in COLS)
           for r in pq.read_table(GOLDEN).to_pylist()]
    assert got == _pure() and len(got) == 45


def test_spark_reader_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    df = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.ar_archive_rows()],
        "url string, payload binary").repartition(8)
    got = sorted(tuple(r) for r in
                 sources.read_ar_archives(df).collect())
    assert got == sorted(_pure())


def test_fuzz_never_raises():
    rng = random.Random(66)
    real = [r["payload"] for r in fixtures.ar_archive_rows()
            if len(r["payload"]) > 70]
    for _ in range(150):
        blob = b"!<arch>\n" + bytes(
            rng.randrange(256)
            for _ in range(rng.randrange(0, 250)))
        assert isinstance(arx.parse_ar(blob)["members"], list)
    for _ in range(80):
        base = bytearray(real[rng.randrange(len(real))])
        for _ in range(rng.randrange(1, 12)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        d = arx.parse_ar(bytes(base[:rng.randrange(
            0, len(base) + 1)]))
        assert isinstance(d["members"], list)
