"""Windows .lnk family: header/flags/FILETIME vectors, LinkInfo
paths, unicode vs codepage StringData, golden pin, Spark parity,
fuzz."""

import random

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import lnkx

COLS = ["flags", "attributes", "created", "accessed", "modified",
        "target_size", "icon_index", "show_cmd", "volume_label",
        "base_path", "common_suffix", "name", "rel_path",
        "workdir", "arguments", "icon_location"]


def _by_name():
    return {r["url"].rsplit("/", 1)[1]: r["payload"]
            for r in fixtures.lnk_file_rows()}


def test_shortcut_semantics():
    by = _by_name()
    d = lnkx.parse_lnk(by["crawl.lnk"])
    assert d["created"] == "2012-03-04T10:20:30Z"
    assert d["modified"] == "2015-07-08T01:02:03Z"
    assert d["accessed"] is None
    assert d["target_size"] == 48213
    assert d["base_path"] == "C:\\Tools\\crawl.exe"
    assert d["volume_label"] == "SYSTEM"
    assert d["arguments"] == "--fast --depth 3"
    assert "has_idlist" in d["flags"] and "unicode" in d["flags"]
    # codepage strings + attribute names + show mapping
    old = lnkx.parse_lnk(by["legacy.lnk"])
    assert old["name"] == "Ancien raccourci é"
    assert old["attributes"] == "readonly|archive"
    assert old["show_cmd"] == "maximized"
    bare = lnkx.parse_lnk(by["bare.lnk"])
    assert bare["name"] is None and bare["base_path"] is None
    assert lnkx.parse_lnk(by["cut.lnk"]) is None
    assert lnkx.parse_lnk(by["junk.lnk"]) is None
    assert lnkx.parse_lnk(None) is None


def _pure():
    out = []
    for r in fixtures.lnk_file_rows():
        d = lnkx.parse_lnk(r["payload"])
        if d is None:
            continue
        out.append((r["url"],) + tuple(d[c] for c in COLS))
    return out


def test_match_committed_golden():
    got = [tuple(r.values()) for r in pq.read_table(
        "fixtures/golden_lnk_seed42_n5.parquet").to_pylist()]
    assert got == _pure() and len(got) == 3


def test_spark_reader_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    df = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.lnk_file_rows()],
        "url string, payload binary").repartition(4)
    got = sorted((tuple(r) for r in
                  sources.read_lnk_shortcuts(df).collect()),
                 key=str)
    assert got == sorted(_pure(), key=str)


def test_fuzz_never_raises():
    rng = random.Random(75)
    real = [r["payload"] for r in fixtures.lnk_file_rows()
            if len(r["payload"]) > 76]
    head = b"\x4c\x00\x00\x00" + lnkx._CLSID
    for _ in range(200):
        blob = head + bytes(rng.randrange(256)
                            for _ in range(rng.randrange(0, 200)))
        lnkx.parse_lnk(blob)
    for _ in range(100):
        base = bytearray(real[rng.randrange(len(real))])
        for _ in range(rng.randrange(1, 8)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        lnkx.parse_lnk(bytes(base[:rng.randrange(
            0, len(base) + 1)]))


def test_negative_icon_index_signed_and_int32_safe(spark):
    """Regression (r6, ADVICE r5): IconIndex is SIGNED i32 per
    [MS-SHLLINK]; read as u32, 0xFFFFFFFB (= -5, a real-world negative
    resource id) became 4294967291 and killed the whole mapInPandas
    batch at the Int32 column. The builder always writes icon=0, so
    patch the header bytes directly."""
    from historicaldatadocumentparsersystem_spark import sources
    blob = bytearray(lnkx.build_lnk(target_size=7, name="x"))
    blob[56:60] = (0xFFFFFFFB).to_bytes(4, "little")
    d = lnkx.parse_lnk(bytes(blob))
    assert d is not None and d["icon_index"] == -5
    df = spark.createDataFrame([("u1", bytes(blob))],
                               "url string, payload binary")
    rows = sources.read_lnk_shortcuts(df).collect()
    assert len(rows) == 1 and rows[0]["icon_index"] == -5
