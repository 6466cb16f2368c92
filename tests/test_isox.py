"""ISO 9660 family: descriptor/record vectors, Joliet precedence,
golden pin, Spark parity, fuzz."""

import random

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import isox

GOLDEN = "fixtures/golden_iso_seed42_n4.parquet"
COLS = ["pos", "row_kind", "volume_id", "system_id", "n_sectors",
        "block_size", "has_joliet", "path", "is_dir", "size",
        "lba", "recorded"]


def test_volumes_and_members():
    by = {r["url"].rsplit("/", 1)[1]:
          isox.parse_iso(r["payload"])
          for r in fixtures.iso_image_rows()}
    m = by["mirror.iso"]
    assert (m["volume_id"], m["has_joliet"], m["block_size"]) == \
        ("CRAWL_MIRROR", True, 2048)
    # Joliet names win over the PVD's versioned identifiers
    paths = [x[1] for x in m["members"]]
    assert paths == ["Read Me.txt", "Data Files",
                     "Data Files/inner file.bin"]
    assert m["members"][2][3] == 100  # nested file size
    assert m["members"][0][5] == "2024-10-27T06:00:00"
    # PVD-only image: ';1' versions stripped, both-endian checked
    f = by["firmware.iso"]
    assert not f["has_joliet"]
    assert [x[1] for x in f["members"]] == ["BOOT.IMG",
                                            "VERSION.TXT"]
    # truncation keeps the descriptors, drops unreachable trees
    assert by["cut.iso"]["volume_id"] == "CRAWL_MIRROR"
    assert by["cut.iso"]["members"] == []
    assert by["junk.iso"]["volume_id"] is None


def _pure() -> list[tuple]:
    out = []
    for r in fixtures.iso_image_rows():
        d = isox.parse_iso(r["payload"])
        if d["volume_id"] is None and d["system_id"] is None \
                and d["n_sectors"] is None:
            continue
        base = (d["volume_id"], d["system_id"], d["n_sectors"],
                d["block_size"], d["has_joliet"])
        out.append((r["url"], 0, "volume") + base + (None,) * 5)
        for (pos, path, is_dir, size, lba, recorded) in \
                d["members"]:
            out.append((r["url"], pos, "member") + base
                       + (path, is_dir, size, lba, recorded))
    return out


def test_match_committed_golden():
    got = [(r["url"],) + tuple(r[c] for c in COLS)
           for r in pq.read_table(GOLDEN).to_pylist()]
    assert got == _pure() and len(got) == 8


def test_spark_reader_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    df = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.iso_image_rows()],
        "url string, payload binary").repartition(4)
    got = sorted(tuple(r) for r in
                 sources.read_iso_images(df).collect())
    assert got == sorted(_pure())


def test_fuzz_never_raises():
    rng = random.Random(69)
    real = [r["payload"] for r in fixtures.iso_image_rows()
            if len(r["payload"]) > 40000]
    for _ in range(40):
        base = bytearray(real[rng.randrange(len(real))])
        for _ in range(rng.randrange(1, 24)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        d = isox.parse_iso(bytes(base[:rng.randrange(
            0, len(base) + 1)]))
        assert isinstance(d["members"], list)
    # descriptor-area garbage
    for _ in range(40):
        blob = bytes(17 * 2048)  # all zeros, then scribble
        b = bytearray(blob)
        b[16 * 2048:16 * 2048 + 8] = b"\x01CD001\x01\x00"
        for _ in range(rng.randrange(0, 30)):
            b[16 * 2048 + rng.randrange(2048)] = rng.randrange(256)
        assert isinstance(
            isox.parse_iso(bytes(b))["members"], list)


def test_blank_ids_keep_members(spark):
    """ADVICE r4: a valid PVD with blank volume/system ids AND a
    both-endian-mismatched sector count must still emit its volume
    row and walked members (gate on parse success, not header
    nullness)."""
    import struct
    S = 2048

    def u32b(v):
        return struct.pack("<I", v) + struct.pack(">I", v)

    def u16b(v):
        return struct.pack("<H", v) + struct.pack(">H", v)

    def rec(name, extent, size, is_dir=False):
        raw = (b"\x00" if name == "." else
               b"\x01" if name == ".." else name.encode("ascii"))
        ln = 33 + len(raw)
        ln += ln & 1
        out = bytearray(ln)
        out[0] = ln
        out[2:10] = u32b(extent)
        out[10:18] = u32b(size)
        out[18:25] = bytes([124, 10, 27, 6, 0, 0, 0])
        out[25] = 2 if is_dir else 0
        out[28:32] = u16b(1)
        out[32] = len(raw)
        out[33:33 + len(raw)] = raw
        return bytes(out)

    d = bytearray(S)
    d[0] = 1
    d[1:7] = b"CD001\x01"
    d[8:40] = b" " * 32                    # blank system id
    d[40:72] = b" " * 32                   # blank volume id
    d[80:88] = struct.pack("<I", 26) + struct.pack(">I", 27)  # != !
    d[120:124] = u16b(1)
    d[124:128] = u16b(1)
    d[128:132] = u16b(S)
    d[156:190] = rec(".", 17, S, True)
    root = (rec(".", 17, S, True) + rec("..", 17, S, True)
            + rec("HELLO.TXT;1", 18, 5)).ljust(S, b"\x00")
    img = b"\x00" * (16 * S) + bytes(d) + root \
        + b"hello".ljust(S, b"\x00")
    pure = isox.parse_iso(img)
    assert pure["ok"] and pure["volume_id"] is None \
        and pure["n_sectors"] is None
    assert [m[1] for m in pure["members"]] == ["HELLO.TXT"]
    from historicaldatadocumentparsersystem_spark import sources
    df = spark.createDataFrame(
        [("https://x.example.org/blank.iso", bytearray(img))],
        "url string, payload binary")
    rows = sources.read_iso_images(df).collect()
    kinds = sorted(r.row_kind for r in rows)
    assert kinds == ["member", "volume"]
