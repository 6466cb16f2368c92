"""Compressed-frame family: stdlib-backed member walks, structural
zstd/lz4 walks, golden pin, Spark parity, fuzz."""

import random

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import compx

GOLDEN = "fixtures/golden_comp_seed42_n10.parquet"
COLS = ["pos", "format", "kind", "comp_size", "raw_size", "extra",
        "ok"]


def _by_name():
    return {r["url"].rsplit("/", 1)[1]:
            compx.parse_compressed(r["payload"])
            for r in fixtures.compressed_stream_rows()}


def test_formats_and_members():
    by = _by_name()
    gz = by["pages.warc.gz"]
    assert gz["format"] == "gzip" and len(gz["frames"]) == 3
    # FNAME surfaces; ISIZE verified; empty member raw 0
    assert gz["frames"][1][4] == "page-2.warc"
    assert gz["frames"][0][3] == 1760
    assert gz["frames"][2][3] == 0
    # consumed extents tile the payload exactly
    payload = [r for r in fixtures.compressed_stream_rows()
               if r["url"].endswith("pages.warc.gz")][0]["payload"]
    assert sum(f[2] for f in gz["frames"]) == len(payload)
    # bzip2/xz members with their header extras
    assert [f[4] for f in by["dump.bz2"]["frames"]] == \
        ["level:5", "level:1"]
    assert [f[4] for f in by["logs.xz"]["frames"]] == \
        ["check:crc64", "check:crc32"]
    # zstd: FCS sizes (1-byte and 4-byte), skippable, RLE block
    zs = by["shard.zst"]["frames"]
    assert [(f[1], f[3]) for f in zs] == \
        [("frame", 130), ("skippable", 12), ("frame", 1000)]
    # lz4: content size when present, None when absent
    lz = by["batch.lz4"]["frames"]
    assert [f[3] for f in lz] == [80, None]
    # truncations drop the incomplete frame
    assert by["cut.gz"]["frames"] == []
    assert by["cut.zst"]["frames"] == []
    assert by["plain.txt"]["format"] is None
    # a windowed no-FCS frame reports unknown raw size
    assert by["nested.gz.zst"]["frames"][0][3] is None


def _pure() -> list[tuple]:
    out = []
    for r in fixtures.compressed_stream_rows():
        d = compx.parse_compressed(r["payload"])
        if d["format"] is None:
            continue
        for (pos, kind, comp, raw, extra, ok) in d["frames"]:
            out.append((r["url"], pos, d["format"], kind, comp,
                        raw, extra, ok))
    return out


def test_match_committed_golden():
    got = [(r["url"],) + tuple(r[c] for c in COLS)
           for r in pq.read_table(GOLDEN).to_pylist()]
    assert got == _pure() and len(got) == 14


def test_spark_reader_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    df = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.compressed_stream_rows()],
        "url string, payload binary").repartition(8)
    got = sorted(tuple(r) for r in
                 sources.read_compressed_frames(df).collect())
    assert got == sorted(_pure())


def test_fuzz_never_raises():
    rng = random.Random(64)
    real = [r["payload"] for r in fixtures.compressed_stream_rows()
            if len(r["payload"]) > 20]
    magics = (b"\x1f\x8b", b"BZh5", b"\xfd7zXZ\x00",
              (0xFD2FB528).to_bytes(4, "little"),
              (0x184D2204).to_bytes(4, "little"))
    for _ in range(200):
        blob = magics[rng.randrange(len(magics))] + bytes(
            rng.randrange(256)
            for _ in range(rng.randrange(0, 150)))
        assert isinstance(
            compx.parse_compressed(blob)["frames"], list)
    for _ in range(80):
        base = bytearray(real[rng.randrange(len(real))])
        for _ in range(rng.randrange(1, 10)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        d = compx.parse_compressed(bytes(base[:rng.randrange(
            0, len(base) + 1)]))
        assert isinstance(d["frames"], list)


def test_bomb_counts_without_materializing():
    """a gzip bomb's raw size is COUNTED, never materialized —
    the member row reports the true inflated length in O(chunk)
    memory (review regression)."""
    import zlib
    big = 64 * 1024 * 1024
    co = zlib.compressobj(9, zlib.DEFLATED, 31)
    blob = co.compress(b"\x00" * big) + co.flush()
    fr = compx.parse_compressed(blob)["frames"]
    assert fr and fr[0][3] == big and fr[0][5]
