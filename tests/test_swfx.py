"""SWF family: RECT bit math, tag census incl. the 0x3F length
escape, zlib body bounding, golden pin, Spark parity, fuzz."""

import random
import struct

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import swfx


def _by_name():
    return {r["url"].rsplit("/", 1)[1]: r["payload"]
            for r in fixtures.swf_file_rows()}


def test_header_and_tags():
    by = _by_name()
    d = swfx.parse_swf(by["banner.swf"])
    assert (d["width_px"], d["height_px"]) == (468, 60)
    assert (d["frame_rate"], d["frame_count"]) == (18, 2)
    census = {c: (n, tb) for (c, _nm, n, tb) in d["tags"]}
    assert census[2] == (1, 80)        # the 0x3F long-escape tag
    assert census[1] == (2, 0)
    assert census[12] == (1, 10)
    # zlib body: bounded inflate, same walk
    m = swfx.parse_swf(by["movie.swf"])
    assert m["compression"] == "zlib" and m["version"] == 11
    assert (m["width_px"], m["frame_count"]) == (550, 3)
    # LZMA: header-indexed only (the WOFF2 Brotli-gate rule)
    z = swfx.parse_swf(by["modern.swf"])
    assert z["compression"] == "lzma" and z["version"] == 13
    assert z["declared_len"] == 4096 and z["width_px"] is None
    assert swfx.parse_swf(by["cut.swf"]) is not None  # header only
    assert swfx.parse_swf(by["junk.swf"]) is None
    assert swfx.parse_swf(None) is None


def test_rect_bit_math():
    # nbits=0 rect: all-zero dims, one byte
    assert swfx._rect(b"\x00\x00\x00\x00\x00") == (0, 0, 1)
    # 11000 px stage (Twips 220000) needs 18 bits
    blob = swfx.build_swf(11000, 1, 1, [])
    d = swfx.parse_swf(blob)
    assert (d["width_px"], d["height_px"]) == (11000, 1)


def _pure():
    out = []
    for r in fixtures.swf_file_rows():
        d = swfx.parse_swf(r["payload"])
        if d is None:
            continue
        out.append((r["url"], 0, "file", d["compression"],
                    d["version"], d["declared_len"], d["width_px"],
                    d["height_px"], d["frame_rate"],
                    d["frame_count"], None, None, None, None))
        for i, (code, name, n, tb) in enumerate(d["tags"]):
            out.append((r["url"], i, "tag", None, None, None,
                        None, None, None, None, code, name, n, tb))
    return out


def test_match_committed_golden():
    got = [tuple(r.values()) for r in pq.read_table(
        "fixtures/golden_swf_seed42_n5.parquet").to_pylist()]
    assert got == _pure() and len(got) == 15


def test_spark_reader_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    df = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.swf_file_rows()],
        "url string, payload binary").repartition(4)
    got = sorted((tuple(r) for r in
                  sources.read_swf_files(df).collect()), key=str)
    assert got == sorted(_pure(), key=str)


def test_zlib_bomb_bounded():
    """A CWS whose body inflates far past the declared length must
    stay bounded by the declaration (never a giant allocation)."""
    import zlib
    bomb = zlib.compress(b"\x00" * (32 << 20), 9)
    blob = b"CWS\x09" + struct.pack("<I", 100) + bomb
    d = swfx.parse_swf(blob)              # must return, not OOM
    assert d is not None and d["compression"] == "zlib"


def test_fuzz_never_raises():
    rng = random.Random(71)
    real = [r["payload"] for r in fixtures.swf_file_rows()
            if len(r["payload"]) > 12]
    for _ in range(200):
        blob = rng.choice([b"FWS", b"CWS", b"ZWS"]) + bytes(
            rng.randrange(256)
            for _ in range(rng.randrange(0, 150)))
        swfx.parse_swf(blob)
    for _ in range(100):
        base = bytearray(real[rng.randrange(len(real))])
        for _ in range(rng.randrange(1, 8)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        swfx.parse_swf(bytes(base[:rng.randrange(
            0, len(base) + 1)]))
