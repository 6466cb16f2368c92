"""MP4/ISO-BMFF media metadata: extractor/mp4x.py (pure oracle,
golden-pinned), box-walk semantics, and the Spark operator."""

import random
import struct

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import mp4x

GOLDEN = "fixtures/golden_mp4_seed42_n20.parquet"
_COLS = ("media_id", "brand", "duration_ms", "n_boxes", "track_id",
         "handler", "codec", "width", "height", "track_ms", "lang")


def _pure_rows() -> list[tuple]:
    out = []
    for r in fixtures.mp4_media_rows(20):
        info = mp4x.parse_mp4(r["payload"])
        if info is None:
            continue
        if not info.tracks:
            out.append((r["media_id"], info.brand, info.duration_ms,
                        info.n_boxes, None, None, None, None, None,
                        None, None))
        for t in info.tracks:
            out.append((r["media_id"], info.brand, info.duration_ms,
                        info.n_boxes, t.track_id, t.handler, t.codec,
                        t.width, t.height, t.duration_ms, t.lang))
    return out


def test_matches_committed_golden():
    golden = [tuple(r[k] for k in _COLS)
              for r in pq.read_table(GOLDEN).to_pylist()]
    assert golden == _pure_rows()
    assert len(golden) == 24


def test_round_trip_v0_v1_and_largesize():
    for version, large in ((0, False), (1, True)):
        p = mp4x.make_mp4(brand="mp42", timescale=600, duration=1800,
                          version=version, large_mdat=large,
                          tracks=[{"track_id": 5, "handler": "vide",
                                   "codec": "avc1", "width": 1280,
                                   "height": 720, "duration": 1800,
                                   "lang": "eng"}])
        info = mp4x.parse_mp4(p)
        assert (info.brand, info.timescale, info.duration_ms) == \
            ("mp42", 600, 3000)
        t = info.tracks[0]
        assert (t.track_id, t.handler, t.codec, t.width, t.height,
                t.duration_ms, t.lang) == (5, "vide", "avc1", 1280,
                                           720, 3000, "eng")


def test_language_packing():
    assert mp4x._lang(mp4x._pack_lang("eng")) == "eng"
    assert mp4x._lang(mp4x._pack_lang("jpn")) == "jpn"
    assert mp4x._lang(0) == "und"          # zero code -> undetermined
    assert mp4x._pack_lang("") == mp4x._pack_lang("und")
    assert mp4x._lang(mp4x._pack_lang("")) == "und"


def test_box_walk_degrades_on_truncation():
    p = mp4x.make_mp4(tracks=[{"track_id": 1, "handler": "vide",
                               "codec": "avc1"}])
    full = mp4x.parse_mp4(p).n_boxes
    for cut in (12, 20, 40, len(p) - 3):
        info = mp4x.parse_mp4(p[:cut])
        assert info is not None and info.n_boxes <= full
    # absurd declared size ends the level, never raises
    bad = p[:8] + struct.pack(">I", 2 ** 31) + p[12:]
    assert mp4x.parse_mp4(bad) is not None
    assert mp4x.parse_mp4(b"\x00\x00\x00\x08free") is None
    assert mp4x.parse_mp4(None) is None


def test_never_raises_on_fuzz():
    rng = random.Random("mp4x-fuzz")
    for _ in range(300):
        body = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(200)))
        payload = body[:4] + b"ftyp" + body[4:]
        info = mp4x.parse_mp4(payload)
        if len(payload) >= 12:
            assert info is not None
            for t in info.tracks:
                assert isinstance(t.lang, str) and len(t.lang) == 3


def test_spark_operator_matches_golden(spark):
    from historicaldatadocumentparsersystem_spark.operators import (
        multimodal)
    files = fixtures.mp4_media_rows(20)
    df = spark.createDataFrame(
        [(r["media_id"], r["payload"]) for r in files],
        "media_id string, payload binary").repartition(4)
    # media_id leads every tuple and None track fields only occur on
    # trackless (single-row) media ids, so plain tuple sort is safe
    got = sorted(tuple(r)
                 for r in multimodal.video_metadata(df).collect())
    assert got == sorted(_pure_rows())
