"""Font family: name-table decoding per platform, WOFF zlib path,
golden pin, Spark parity, fuzz."""

import random

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import fontx

GOLDEN = "fixtures/golden_fonts_seed42_n8.parquet"
COLS = ["pos", "row_kind", "kind", "flavor", "n_tables", "tag",
        "offset", "length", "comp_length", "name_id", "name_kind",
        "platform", "value"]


def _by_name():
    return {r["url"].rsplit("/", 1)[1]:
            fontx.parse_font(r["payload"])
            for r in fixtures.font_file_rows()}


def test_containers_and_names():
    by = _by_name()
    tt = by["inter.ttf"]
    assert (tt["kind"], tt["flavor"]) == ("sfnt", "truetype")
    assert [t[1] for t in tt["tables"]] == ["head", "name", "glyf"]
    # Windows platform strings are UTF-16BE
    assert ("family", "Inter Display") in \
        [(n[2], n[4]) for n in tt["names"]]
    # Mac platform strings are byte-per-char (latin-1 superset)
    otf = by["cafe.otf"]
    assert otf["flavor"] == "cff"
    assert ("family", "Café Grande") in \
        [(n[2], n[4]) for n in otf["names"]]
    # WOFF: compressed name table decompresses and parses
    w = by["inter.woff"]
    assert w["kind"] == "woff"
    nm = [t for t in w["tables"] if t[1] == "name"][0]
    assert nm[4] < nm[3]  # comp_length < orig length
    assert ("typo_family", "Inter") in \
        [(n[2], n[4]) for n in w["names"]]
    # WOFF stored table: comp == orig, still parsed
    st = by["stored.woff"]
    assert st["tables"][0][4] == st["tables"][0][3]
    assert len(st["names"]) == 3
    # WOFF2: header only, tables unenumerated (Brotli gated)
    w2 = by["next.woff2"]
    assert (w2["kind"], w2["n_tables"], w2["tables"]) == \
        ("woff2", 7, [])
    assert by["junk.bin"]["kind"] is None
    # truncated directory keeps parsed entries, name unreachable
    tr = by["trunc.ttf"]
    assert len(tr["tables"]) == 2 and tr["names"] == []
    # both platforms in one table decode independently
    ap = by["apple.ttf"]
    fams = [n[4] for n in ap["names"] if n[2] == "family"]
    assert fams == ["Inter Display", "Café Grande"]


def _pure() -> list[tuple]:
    out = []
    for r in fixtures.font_file_rows():
        d = fontx.parse_font(r["payload"])
        if d["kind"] is None:
            continue
        base = (d["kind"], d["flavor"], d["n_tables"])
        out.append((r["url"], 0, "font") + base + (None,) * 8)
        for (pos, tag, off, ln, comp) in d["tables"]:
            out.append((r["url"], pos, "table") + base
                       + (tag, off, ln, comp, None, None, None,
                          None))
        for (pos, nid, nkind, plat, value) in d["names"]:
            out.append((r["url"], pos, "name") + base
                       + (None, None, None, None, nid, nkind,
                          plat, value))
    return out


def test_match_committed_golden():
    got = [(r["url"],) + tuple(r[c] for c in COLS)
           for r in pq.read_table(GOLDEN).to_pylist()]
    assert got == _pure() and len(got) == 41


def test_spark_reader_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    df = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.font_file_rows()],
        "url string, payload binary").repartition(8)
    got = sorted(tuple(r) for r in
                 sources.read_font_metadata(df).collect())
    assert got == sorted(_pure())


def test_fuzz_never_raises():
    rng = random.Random(57)
    real = [r["payload"] for r in fixtures.font_file_rows()
            if len(r["payload"]) > 30]
    for _ in range(150):
        prefix = (b"\x00\x01\x00\x00", b"wOFF", b"wOF2",
                  b"OTTO")[rng.randrange(4)]
        blob = prefix + bytes(rng.randrange(256)
                              for _ in range(rng.randrange(0, 150)))
        assert isinstance(fontx.parse_font(blob)["tables"], list)
    for _ in range(80):
        base = bytearray(real[rng.randrange(len(real))])
        for _ in range(rng.randrange(1, 12)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        d = fontx.parse_font(bytes(base[:rng.randrange(
            0, len(base) + 1)]))
        assert isinstance(d["tables"], list)
