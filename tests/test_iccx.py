"""ICC family: header/tag vectors, both description encodings,
golden pin, Spark parity, fuzz."""

import random

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import iccx

GOLDEN = "fixtures/golden_icc_seed42_n5.parquet"
COLS = ["pos", "row_kind", "profile_class", "color_space", "pcs",
        "version", "intent", "created", "n_tags", "sig",
        "tag_offset", "tag_size", "text"]


def test_profiles():
    by = {r["url"].rsplit("/", 1)[1]:
          iccx.parse_icc(r["payload"])
          for r in fixtures.icc_profile_rows()}
    s = by["srgb.icc"]
    assert (s["profile_class"], s["color_space"], s["pcs"]) == \
        ("display", "RGB", "XYZ")
    assert s["version"] == "2.1.0"
    assert s["created"] == "2024-10-27T06:00:00"
    texts = {t[1]: t[4] for t in s["tags"]}
    # ASCII 'desc' and 'text' types decode; XYZ numerics stay raw
    assert texts["desc"] == "sRGB IEC61966-2.1"
    assert texts["cprt"] == "public domain"
    assert texts["wtpt"] is None
    # UTF-16BE 'mluc' description
    p3 = by["p3.icc"]
    assert p3["intent"] == "relative"
    assert p3["tags"][0][4] == "Wide Gamut Display P3"
    # printer profile
    f = by["fogra.icc"]
    assert (f["profile_class"], f["color_space"], f["intent"]) \
        == ("output", "CMYK", "absolute")
    assert f["created"] == "2019-03-02T12:30:45"
    # truncated tag table: header survives, tags drop
    assert by["cut.icc"]["ok"] and by["cut.icc"]["tags"] == []
    assert not by["junk.bin"]["ok"]


def _pure() -> list[tuple]:
    out = []
    for r in fixtures.icc_profile_rows():
        d = iccx.parse_icc(r["payload"])
        if not d["ok"]:
            continue
        base = (d["profile_class"], d["color_space"], d["pcs"],
                d["version"], d["intent"], d["created"],
                d["n_tags"])
        out.append((r["url"], 0, "profile") + base + (None,) * 4)
        for (pos, sig, off, sz, text) in d["tags"]:
            out.append((r["url"], pos, "tag") + base
                       + (sig, off, sz, text))
    return out


def test_match_committed_golden():
    got = [(r["url"],) + tuple(r[c] for c in COLS)
           for r in pq.read_table(GOLDEN).to_pylist()]
    assert got == _pure() and len(got) == 11


def test_spark_reader_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    df = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.icc_profile_rows()],
        "url string, payload binary").repartition(4)
    got = sorted(tuple(r) for r in
                 sources.read_icc_profiles(df).collect())
    assert got == sorted(_pure())


def test_fuzz_never_raises():
    rng = random.Random(68)
    real = [r["payload"] for r in fixtures.icc_profile_rows()
            if len(r["payload"]) > 140]
    for _ in range(150):
        blob = bytearray(rng.randrange(256)
                         for _ in range(rng.randrange(0, 300)))
        if len(blob) >= 40 and rng.random() < 0.5:
            blob[36:40] = b"acsp"
        assert isinstance(
            iccx.parse_icc(bytes(blob))["tags"], list)
    for _ in range(80):
        base = bytearray(real[rng.randrange(len(real))])
        for _ in range(rng.randrange(1, 10)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        d = iccx.parse_icc(bytes(base[:rng.randrange(
            0, len(base) + 1)]))
        assert isinstance(d["tags"], list)
