"""RPM family: lead/header vectors, store types, dependency pairs,
golden pin, Spark parity, fuzz."""

import random

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import rpmx


def _by_name():
    return {r["url"].rsplit("/", 1)[1]: r["payload"]
            for r in fixtures.rpm_file_rows()}


def test_package_metadata():
    by = _by_name()
    d = rpmx.parse_rpm(by["crawl-tools-2.4.1-3.el9.x86_64.rpm"])
    assert (d["name"], d["version"], d["release"], d["arch"]) == \
        ("crawl-tools", "2.4.1", "3.el9", "x86_64")
    assert d["license"] == "Apache-2.0"
    assert d["payload_compressor"] == "zstd"
    assert d["requires"] == [("libc.so.6", None),
                             ("python3", "3.9"),
                             ("libcrawl", "2.0")]
    assert ("crawl-cli", None) in d["provides"]
    docs = rpmx.parse_rpm(
        by["crawl-docs-2.4.1-3.el9.noarch.rpm"])
    assert docs["arch"] == "noarch" and docs["requires"] == []
    assert rpmx.parse_rpm(by["cut.rpm"]) is None
    assert rpmx.parse_rpm(by["junk.rpm"]) is None
    assert rpmx.parse_rpm(None) is None


def test_signature_alignment():
    """The signature header pads to 8 — a main header directly at
    an unaligned offset must NOT parse as the main header."""
    blob = rpmx.build_rpm("a", "1", "1", "noarch")
    d = rpmx.parse_rpm(blob)
    assert d is not None and d["name"] == "a"


def _pure():
    out = []
    for r in fixtures.rpm_file_rows():
        d = rpmx.parse_rpm(r["payload"])
        if d is None:
            continue
        out.append((r["url"], 0, "package", d["name"],
                    d["version"], d["release"], d["arch"],
                    d["license"], d["summary"],
                    d["payload_format"], d["payload_compressor"],
                    None, None, None))
        pos = 0
        for kind in ("requires", "provides"):
            for (dn, dv) in d[kind]:
                out.append((r["url"], pos, "dep", None, None,
                            None, None, None, None, None, None,
                            kind, dn, dv))
                pos += 1
    return out


def test_match_committed_golden():
    got = [tuple(r.values()) for r in pq.read_table(
        "fixtures/golden_rpm_seed42_n5.parquet").to_pylist()]
    assert got == _pure() and len(got) == 11


def test_spark_reader_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    df = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.rpm_file_rows()],
        "url string, payload binary").repartition(4)
    got = sorted((tuple(r) for r in
                  sources.read_rpm_packages(df).collect()),
                 key=str)
    assert got == sorted(_pure(), key=str)


def test_fuzz_never_raises():
    rng = random.Random(70)
    real = [r["payload"] for r in fixtures.rpm_file_rows()
            if len(r["payload"]) > 130]
    for _ in range(200):
        blob = b"\xed\xab\xee\xdb" + bytes(
            rng.randrange(256)
            for _ in range(rng.randrange(0, 200)))
        rpmx.parse_rpm(blob)
    for _ in range(100):
        base = bytearray(real[rng.randrange(len(real))])
        for _ in range(rng.randrange(1, 8)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        rpmx.parse_rpm(bytes(base[:rng.randrange(
            0, len(base) + 1)]))
