"""JVM class-file family: constant-pool vectors (two-slot
Long/Double), javac-17 parity, golden pin, Spark parity, fuzz."""

import random
import shutil
import subprocess
import tempfile

import pyarrow.parquet as pq
import pytest

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import (
    javaclassx as J)

GOLDEN = "fixtures/golden_javaclass_seed42_n5.parquet"


def test_roundtrip_and_two_slot_rule():
    by = {r["url"].rsplit("/", 1)[1]: r["payload"]
          for r in fixtures.java_class_rows()}
    d = J.parse_class(by["Fetcher.class"])
    assert d["class_name"] == "com.example.crawl.Fetcher"
    assert d["super_name"] == "java.lang.Object"
    assert d["interfaces"] == ["java.lang.Runnable",
                               "java.io.Closeable"]
    assert d["source_file"] == "Fetcher.java"
    assert d["java_version"] == "Java 8"
    # the planted CONSTANT_Long takes two slots; names after it
    # still resolve (the classic off-by-one would shift them)
    names = [m[2] for m in d["members"]]
    assert names == ["timeout", "UA", "<init>", "run", "fetch"]
    assert d["members"][1][4] == "public|static|final"
    i = J.parse_class(by["Iface.class"])
    assert "interface" in i["access"] and \
        i["java_version"] == "Java 6"
    old = J.parse_class(by["Old.class"])
    assert old["java_version"] == "JDK 1.2"
    assert J.parse_class(by["cut.class"]) is None
    assert J.parse_class(by["junk.bin"]) is None
    assert J.parse_class(None) is None


@pytest.mark.skipif(shutil.which("javac") is None,
                    reason="javac unavailable")
def test_javac_parity():
    """Real javac output parses with resolved names — the
    git-binary-parity discipline for the JVM format."""
    src = ("package demo;\n"
           "public class Hello implements Runnable {\n"
           "  private static final long BIG = 1099511627776L;\n"
           "  public int count;\n"
           "  public void run() {}\n"
           "  public static byte[] fetch(String url) "
           "{ return null; }\n}\n")
    with tempfile.TemporaryDirectory() as td:
        with open(f"{td}/Hello.java", "w") as f:
            f.write(src)
        subprocess.run(["javac", "-d", td, f"{td}/Hello.java"],
                       check=True, capture_output=True)
        d = J.parse_class(
            open(f"{td}/demo/Hello.class", "rb").read())
    assert d["class_name"] == "demo.Hello"
    assert d["interfaces"] == ["java.lang.Runnable"]
    assert d["source_file"] == "Hello.java"
    got = {(m[1], m[2]): m[3] for m in d["members"]}
    assert got[("field", "BIG")] == "J"
    assert got[("method", "fetch")] == "(Ljava/lang/String;)[B"


def _pure():
    out = []
    for r in fixtures.java_class_rows():
        d = J.parse_class(r["payload"])
        if d is None:
            continue
        out.append((r["url"], 0, "class", d["class_name"],
                    d["super_name"], d["java_version"],
                    d["access"], d["n_cp"], d["source_file"],
                    None, None, None, None))
        for (pos, kind, name, desc, acc) in d["members"]:
            out.append((r["url"], pos, "member", None, None, None,
                        None, None, None, kind, name, desc, acc))
    return out


def test_match_committed_golden():
    got = [tuple(r.values())
           for r in pq.read_table(GOLDEN).to_pylist()]
    assert got == _pure() and len(got) == 10


def test_spark_reader_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    df = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.java_class_rows()],
        "url string, payload binary").repartition(4)
    got = sorted((tuple(r) for r in
                  sources.read_java_classes(df).collect()),
                 key=str)
    assert got == sorted(_pure(), key=str)


def test_fuzz_never_raises():
    rng = random.Random(69)
    real = [r["payload"] for r in fixtures.java_class_rows()
            if len(r["payload"]) > 40]
    for _ in range(200):
        blob = b"\xca\xfe\xba\xbe" + bytes(
            rng.randrange(256)
            for _ in range(rng.randrange(0, 150)))
        J.parse_class(blob)
    for _ in range(100):
        base = bytearray(real[rng.randrange(len(real))])
        for _ in range(rng.randrange(1, 8)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        J.parse_class(bytes(base[:rng.randrange(
            0, len(base) + 1)]))


def test_jar_composition(spark):
    """zip container x class format: every parseable .class member
    lands one census row; bad members and class-less jars are
    skipped cleanly."""
    from historicaldatadocumentparsersystem_spark import sources
    df = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.jar_file_rows()],
        "url string, payload binary").repartition(2)
    rows = sources.read_jar_classes(df).collect()
    by = {r.member: r for r in rows}
    assert set(by) == {"com/example/crawl/Fetcher.class",
                       "org/example/Sink.class", "Old.class"}
    f = by["com/example/crawl/Fetcher.class"]
    assert f.class_name == "com.example.crawl.Fetcher"
    assert (f.n_methods, f.n_fields) == (3, 2)
    assert all(r.url.endswith("crawl-tools.jar") for r in rows)
