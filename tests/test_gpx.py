"""GPX source: epoch parity vs stdlib, range gates, golden pin,
Spark parity, fuzz."""

import calendar
import random

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import gpxx

GOLDEN_GPX = "fixtures/golden_gpx_seed42_n12.parquet"

COLS = ["kind", "trk", "trk_name", "seg", "pt", "name", "lat",
        "lon", "ele", "time", "epoch"]


def _pure_rows(n: int) -> list[tuple]:
    out = []
    for r in fixtures.gpx_file_rows(n):
        for p in gpxx.parse_gpx(r["payload"]):
            out.append((r["url"],) + tuple(p[c] for c in COLS))
    return out


def test_epoch_matches_stdlib():
    rng = random.Random(42)
    for _ in range(500):
        y = rng.randrange(1970, 2100)
        mo = rng.randrange(1, 13)
        d = rng.randrange(1, 29)
        h, mi, s = (rng.randrange(24), rng.randrange(60),
                    rng.randrange(60))
        iso = f"{y:04d}-{mo:02d}-{d:02d}T{h:02d}:{mi:02d}:{s:02d}Z"
        assert gpxx.iso_to_epoch(iso) == calendar.timegm(
            (y, mo, d, h, mi, s)), iso
    assert gpxx.iso_to_epoch("2026-01-01T00:00:00.999Z") == \
        calendar.timegm((2026, 1, 1, 0, 0, 0))  # fraction truncated
    assert gpxx.iso_to_epoch("2026-01-01 00:00:00") is None
    assert gpxx.iso_to_epoch(None) is None


def test_parse_semantics():
    raw = gpxx.build_gpx(
        [{"name": "t", "segments": [
            [(1.0, 2.0, 3.0, "2026-01-01T00:00:00Z"),
             (91.0, 2.0, None, None),       # lat gate
             (1.0, -181.0, None, None),     # lon gate
             (-90.0, 180.0, None, "bad-time")]]}],
        waypoints=[{"name": "w", "lat": 0.0, "lon": 0.0}], ns=True)
    rows = gpxx.parse_gpx(raw)
    kinds = [(r["kind"], r["pt"]) for r in rows]
    assert kinds == [("wpt", None), ("trkpt", 0), ("trkpt", 1)]
    assert rows[2]["time"] is None and rows[2]["epoch"] is None
    assert rows[2]["lat"] == -90.0 and rows[2]["lon"] == 180.0
    assert gpxx.parse_gpx(b"<html/>") == []
    assert gpxx.parse_gpx(b"<gpx") == []
    assert gpxx.parse_gpx(None) == []


def test_matches_committed_golden():
    golden = [(r["url"],) + tuple(r[c] for c in COLS)
              for r in pq.read_table(GOLDEN_GPX).to_pylist()]
    assert golden == _pure_rows(12)
    assert len(golden) == 42


def test_spark_reader_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    files = fixtures.gpx_file_rows(12)
    df = spark.createDataFrame(
        [(r["url"], r["payload"]) for r in files],
        "url string, payload binary").repartition(8)
    got = sorted(tuple(str(x) for x in r)
                 for r in sources.read_gpx_points(df).collect())
    want = sorted(tuple(str(x) for x in r) for r in _pure_rows(12))
    assert got == want


def test_fuzz_never_raises():
    rng = random.Random(10)
    base = fixtures.gpx_file_rows(1)[0]["payload"]
    for _ in range(200):
        gpxx.parse_gpx(bytes(rng.randrange(256)
                             for _ in range(rng.randrange(150))))
    for i in range(0, len(base), 23):
        gpxx.parse_gpx(base[:i])
