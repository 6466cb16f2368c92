"""AVI family: RIFF walk + word alignment, avih/strh vectors,
golden pin, Spark parity, fuzz."""

import random

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import avix


def _by_name():
    return {r["url"].rsplit("/", 1)[1]: r["payload"]
            for r in fixtures.avi_file_rows()}


def test_headers_and_streams():
    by = _by_name()
    d = avix.parse_avi(by["clip.avi"])
    # NTSC: 33367 us/frame -> 29.969 fps (integer milli, no float)
    assert d["us_per_frame"] == 33367 and d["fps_milli"] == 29969
    assert (d["width"], d["height"], d["total_frames"]) == \
        (640, 480, 900)
    v, a = d["streams"]
    assert v[1:] == ("vids", "xvid", 30000 * 1000 // 1001, 900)
    assert a[1] == "auds" and a[2] is None
    pal = avix.parse_avi(by["pal.avi"])
    assert pal["fps_milli"] == 25000
    assert pal["streams"][0][2] == "DIB"
    # truncated header keeps the file row with NULLs
    cut = avix.parse_avi(by["cut.avi"])
    assert cut is not None and cut["streams"] == []
    # RIFF-but-WAVE and junk reject
    assert avix.parse_avi(by["sound.wav"]) is None
    assert avix.parse_avi(by["junk.avi"]) is None
    assert avix.parse_avi(None) is None


def _pure():
    out = []
    for r in fixtures.avi_file_rows():
        d = avix.parse_avi(r["payload"])
        if d is None:
            continue
        out.append((r["url"], 0, "file", d["us_per_frame"],
                    d["fps_milli"], d["width"], d["height"],
                    d["total_frames"], d["n_streams_declared"],
                    None, None, None, None))
        for (pos, kind, handler, rate_milli, length) in \
                d["streams"]:
            out.append((r["url"], pos, "stream", None, None,
                        None, None, None, None, kind, handler,
                        rate_milli, length))
    return out


def test_match_committed_golden():
    got = [tuple(r.values()) for r in pq.read_table(
        "fixtures/golden_avi_seed42_n5.parquet").to_pylist()]
    assert got == _pure() and len(got) == 6


def test_spark_reader_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    df = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.avi_file_rows()],
        "url string, payload binary").repartition(4)
    got = sorted((tuple(r) for r in
                  sources.read_avi_headers(df).collect()),
                 key=str)
    assert got == sorted(_pure(), key=str)


def test_fuzz_never_raises():
    rng = random.Random(76)
    real = [r["payload"] for r in fixtures.avi_file_rows()
            if len(r["payload"]) > 24]
    for _ in range(200):
        blob = b"RIFF" + bytes(rng.randrange(256)
                               for _ in range(rng.randrange(0, 150)))
        avix.parse_avi(blob)
    for _ in range(100):
        base = bytearray(real[rng.randrange(len(real))])
        for _ in range(rng.randrange(1, 8)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        avix.parse_avi(bytes(base[:rng.randrange(
            0, len(base) + 1)]))
