"""GeoJSON family: spec-depth vectors, golden pin, Spark parity,
fuzz."""

import json
import random

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import \
    geojsonx

GOLDEN = "fixtures/golden_geojson_seed42_n12.parquet"
COLS = ["pos", "gtype", "n_geoms", "n_points", "minx", "miny",
        "maxx", "maxy", "name", "n_props"]


def test_geometry_vectors():
    g = geojsonx._geom_stats
    assert g({"type": "Point", "coordinates": [1.0, 2.0]}) == \
        ("Point", 1, 1, 1.0, 2.0, 1.0, 2.0)
    # 3D position: z ignored in the bbox
    assert g({"type": "Point",
              "coordinates": [1.0, 2.0, 99.0]})[2:] == \
        (1, 1.0, 2.0, 1.0, 2.0)
    assert g({"type": "LineString",
              "coordinates": [[0.0, 0.0], [2.0, -1.0]]}) == \
        ("LineString", 1, 2, 0.0, -1.0, 2.0, 0.0)
    # spec nesting depths are enforced
    for bad in (
            {"type": "Point", "coordinates": [1.0]},
            {"type": "Point", "coordinates": [True, 1.0]},
            {"type": "Point", "coordinates": [1.0, 2.0, 3.0, 4.0]},
            {"type": "LineString", "coordinates": []},
            {"type": "Polygon",
             "coordinates": [[1.0, 2.0], [3.0, 4.0]]},
            {"type": "Nonsense", "coordinates": [1.0, 2.0]},
            {"type": "Point", "coordinates": [float("nan"), 1.0]},
            None, "x", 7):
        assert g(bad)[0] == "invalid", bad
    # GeometryCollection aggregates counts and bbox
    gc = g({"type": "GeometryCollection", "geometries": [
        {"type": "Point", "coordinates": [5.0, 5.0]},
        {"type": "MultiPoint",
         "coordinates": [[-1.0, 0.0], [2.0, 9.0]]}]})
    assert gc == ("GeometryCollection", 2, 3, -1.0, 0.0, 5.0, 9.0)
    # one invalid sub poisons the collection
    assert g({"type": "GeometryCollection", "geometries": [
        {"type": "Point", "coordinates": [5.0]}]})[0] == "invalid"


def test_roots_and_feature_rows():
    d = geojsonx.parse_geojson(json.dumps(
        {"type": "Feature", "properties": {"name": "x", "a": 1},
         "geometry": {"type": "Point", "coordinates": [1.0, 2.0]}}))
    assert d["root"] == "Feature" and d["features"][0][-2:] == \
        ("x", 2)
    d = geojsonx.parse_geojson('{"type": "Point", '
                               '"coordinates": [1.0, 2.0]}')
    assert d["root"] == "geometry" and len(d["features"]) == 1
    # null geometry surfaces as 'invalid', not dropped
    d = geojsonx.parse_geojson(json.dumps(
        {"type": "FeatureCollection", "features": [
            {"type": "Feature", "geometry": None}]}))
    assert d["features"][0][1] == "invalid"
    for junk in (None, b"\xff", b"[1,2]", b'{"type":"Nope"}', b""):
        assert geojsonx.parse_geojson(junk)["features"] == []


def _pure() -> list[tuple]:
    out = []
    for r in fixtures.geojson_file_rows(12):
        for t in geojsonx.parse_geojson(r["payload"])["features"]:
            out.append((r["url"],) + t)
    return out


def test_match_committed_golden():
    got = [(r["url"],) + tuple(r[c] for c in COLS)
           for r in pq.read_table(GOLDEN).to_pylist()]
    assert got == _pure() and len(got) == 25


def test_spark_reader_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    df = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.geojson_file_rows(12)],
        "url string, payload binary").repartition(8)
    got = sorted(tuple(r) for r in
                 sources.read_geojson_features(df).collect())
    assert got == sorted(_pure())


def test_fuzz_never_raises():
    rng = random.Random(51)
    for _ in range(200):
        blob = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(0, 150)))
        assert isinstance(
            geojsonx.parse_geojson(blob)["features"], list)


def test_deep_nesting_never_raises():
    """ADVICE r4: deeply nested JSON (RecursionError from the C
    scanner) and deeply nested GeometryCollections must both come
    back as clean non-parses, never exceptions."""
    deep = b"[" * 5000 + b"]" * 5000
    assert geojsonx.parse_geojson(deep)["features"] == []
    geom = {"type": "Point", "coordinates": [1.0, 2.0]}
    for _ in range(64):
        geom = {"type": "GeometryCollection", "geometries": [geom]}
    doc = {"type": "Feature", "geometry": geom, "properties": {}}
    import json as _json
    d = geojsonx.parse_geojson(_json.dumps(doc).encode())
    assert d["features"][0][1] == "invalid"   # capped at depth 32
    # shallow nesting still walks
    ok = {"type": "GeometryCollection", "geometries": [
        {"type": "GeometryCollection", "geometries": [
            {"type": "Point", "coordinates": [3.0, 4.0]}]}]}
    doc2 = {"type": "Feature", "geometry": ok, "properties": {}}
    d2 = geojsonx.parse_geojson(_json.dumps(doc2).encode())
    assert d2["features"][0][1] == "GeometryCollection"
