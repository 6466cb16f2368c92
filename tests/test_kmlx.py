"""KML family: folder nesting, geometry census/bbox, lon-lat order,
time instants, golden pin, Spark parity, fuzz."""

import random

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import kmlx

GOLDEN = "fixtures/golden_kml_seed42_n5.parquet"
COLS = ["pos", "folder", "name", "gtype", "n_points",
        "min_lon", "min_lat", "max_lon", "max_lat",
        "t_begin", "t_end"]


def _by_name():
    return {r["url"].rsplit("/", 1)[1]: r["payload"]
            for r in fixtures.kml_file_rows()}


def test_placemark_semantics():
    by = _by_name()
    rows = {r["name"]: r for r in kmlx.parse_kml(by["city.kml"])}
    f = rows["Fountain"]
    # KML tuples are lon,lat — Paris lon ~2.35, lat ~48.86
    assert (f["min_lon"], f["min_lat"]) == (2.3522, 48.8566)
    assert f["t_begin"] == f["t_end"] == 1563105600
    assert f["folder"] == "doc/Landmarks"
    w = rows["Old Walk"]
    assert (w["n_points"], w["gtype"]) == (3, "LineString")
    assert w["t_begin"] < w["t_end"]
    p = rows["Green Park"]
    assert p["folder"] == "doc/Landmarks/Parks"
    assert p["gtype"] == "Polygon" and p["n_points"] == 4
    # MultiGeometry: member union census + first-member type
    m = kmlx.parse_kml(by["multi.kml"])[0]
    assert m["gtype"] == "multi:Point" and m["n_points"] == 3
    assert (m["min_lon"], m["max_lat"]) == (-3.7, 40.5)


def test_range_gate_and_rejects():
    by = _by_name()
    rows = kmlx.parse_kml(by["edge.kml"])
    e = rows[0]
    assert e["n_points"] == 1 and e["min_lon"] == 9.5
    assert rows[1]["min_lon"] is None        # no valid vertex
    assert kmlx.parse_kml(by["feed.xml"]) == []   # non-KML XML
    assert kmlx.parse_kml(by["junk.kml"]) == []
    assert kmlx.parse_kml(None) == []


def _pure():
    out = []
    for r in fixtures.kml_file_rows():
        for p in kmlx.parse_kml(r["payload"]):
            out.append((r["url"],) + tuple(p[c] for c in COLS))
    return out


def test_match_committed_golden():
    got = [tuple(r.values())
           for r in pq.read_table(GOLDEN).to_pylist()]
    assert got == _pure() and len(got) == 6


def test_spark_reader_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    df = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.kml_file_rows()],
        "url string, payload binary").repartition(4)
    got = sorted((tuple(r) for r in
                  sources.read_kml_placemarks(df).collect()),
                 key=str)
    assert got == sorted(_pure(), key=str)


def test_fuzz_never_raises():
    rng = random.Random(68)
    real = [r["payload"] for r in fixtures.kml_file_rows()
            if len(r["payload"]) > 60]
    for _ in range(100):
        blob = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(0, 200)))
        assert isinstance(kmlx.parse_kml(blob), list)
    for _ in range(60):
        base = bytearray(real[rng.randrange(len(real))])
        for _ in range(rng.randrange(1, 8)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        kmlx.parse_kml(bytes(base[:rng.randrange(
            0, len(base) + 1)]))
