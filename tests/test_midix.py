"""SMF family: running status, data widths, VLQ, tempo/signature,
SMPTE division, golden pin, Spark parity, fuzz."""

import random

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import midix


def _by_name():
    return {r["url"].rsplit("/", 1)[1]: r["payload"]
            for r in fixtures.midi_file_rows()}


def test_header_and_tracks():
    by = _by_name()
    d = midix.parse_midi(by["song.mid"])
    assert (d["format"], d["n_tracks_declared"],
            d["division"]) == (1, 3, 480)
    assert d["tempo_us"] == 500000 and d["bpm"] == 120
    assert d["time_sig"] == "4/4"
    tr = {t[1]: t for t in d["tracks"]}
    # running status: three notes on the Lead track, one on Bass
    assert tr["Lead"][3] == 3 and tr["Bass"][3] == 1
    assert tr["Lead"][4] == 960            # cumulative ticks
    # Cx program change consumed ONE data byte (else the count
    # after it would desync)
    assert tr["Lead"][2] == 9
    # format 0 + velocity-0 note-offs not counted as notes
    loop = midix.parse_midi(by["loop.mid"])
    assert loop["format"] == 0
    assert loop["tracks"][0][3] == 2
    # SMPTE division: high bit flagged, 15-bit value kept
    sm = midix.parse_midi(by["smpte.mid"])
    assert sm["smpte"] is True and sm["division"] == 0x6728
    # truncated header-only file keeps the file row, no tracks
    cut = midix.parse_midi(by["cut.mid"])
    assert cut is not None and cut["tracks"] == []
    assert midix.parse_midi(by["junk.mid"]) is None
    assert midix.parse_midi(None) is None


def test_vlq_vectors():
    # spec examples: 0x40 -> 0x40; 0x2000 -> C0 00; 0x1FFFFF -> FF FF 7F
    assert midix._enc_vlq(0x40) == b"\x40"
    assert midix._enc_vlq(0x2000) == b"\xc0\x00"
    assert midix._enc_vlq(0x1FFFFF) == b"\xff\xff\x7f"
    for v in (0, 1, 127, 128, 0x3FFF, 0x4000, 0x0FFFFFFF):
        enc = midix._enc_vlq(v)
        assert midix._vlq(enc, 0) == (v, len(enc))


def _pure():
    out = []
    for r in fixtures.midi_file_rows():
        d = midix.parse_midi(r["payload"])
        if d is None:
            continue
        out.append((r["url"], 0, "file", d["format"],
                    d["n_tracks_declared"], d["division"],
                    d["smpte"], d["tempo_us"], d["bpm"],
                    d["time_sig"], None, None, None, None))
        for (pos, name, n_ev, n_notes, ticks) in d["tracks"]:
            out.append((r["url"], pos, "track", None, None, None,
                        None, None, None, None, name, n_ev,
                        n_notes, ticks))
    return out


def test_match_committed_golden():
    got = [tuple(r.values()) for r in pq.read_table(
        "fixtures/golden_midi_seed42_n5.parquet").to_pylist()]
    assert got == _pure() and len(got) == 9


def test_spark_reader_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    df = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.midi_file_rows()],
        "url string, payload binary").repartition(4)
    got = sorted((tuple(r) for r in
                  sources.read_midi_files(df).collect()), key=str)
    assert got == sorted(_pure(), key=str)


def test_fuzz_never_raises():
    rng = random.Random(74)
    real = [r["payload"] for r in fixtures.midi_file_rows()
            if len(r["payload"]) > 20]
    for _ in range(200):
        blob = b"MThd" + bytes(
            rng.randrange(256)
            for _ in range(rng.randrange(0, 150)))
        midix.parse_midi(blob)
    for _ in range(100):
        base = bytearray(real[rng.randrange(len(real))])
        for _ in range(rng.randrange(1, 8)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        midix.parse_midi(bytes(base[:rng.randrange(
            0, len(base) + 1)]))
