"""GeoJSON (RFC 7946) feature reader — pure Python, from scratch
over stdlib json, Spark-free.

The vector-geometry sibling of ``gpxx`` (tracks): web datasets
ship boundaries/POIs as GeoJSON, and the
engine's view is INDEX-SHAPED — one row per feature with geometry
type, coordinate counts, and the bbox — never a geometry engine.
bbox is min/max only (comparisons, no arithmetic), so values are
bit-stable through the golden parquet in every engine; no
haversine/centroid (transcendentals and means have no cross-engine
IEEE guarantee — the gpxx rule).

Accepted roots: FeatureCollection / Feature / bare geometry
(including GeometryCollection). Geometry VALIDATION follows the
spec's nesting depths (Point 0 / Multi*+LineString 1 / Polygon 2 /
MultiPolygon 3, positions = 2-3 finite numbers, bools rejected);
a malformed geometry yields gtype 'invalid' with NULL stats rather
than dropping the feature — corpus audits need to SEE the rot.
"""

from __future__ import annotations

import json

_DEPTH = {"Point": 0, "MultiPoint": 1, "LineString": 1,
          "MultiLineString": 2, "Polygon": 2, "MultiPolygon": 3}


def _is_num(v) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool) \
        and v == v and v not in (float("inf"), float("-inf"))


def _walk(coords, depth: int, acc: list) -> bool:
    """Validate nesting and collect positions into acc."""
    if depth == 0:
        if (not isinstance(coords, list) or len(coords) < 2
                or len(coords) > 3
                or not all(_is_num(c) for c in coords)):
            return False
        acc.append((float(coords[0]), float(coords[1])))
        return True
    if not isinstance(coords, list) or not coords:
        return False
    return all(_walk(c, depth - 1, acc) for c in coords)


def _geom_stats(geom, depth: int = 0) -> tuple:
    """geometry dict -> (gtype, n_geoms, n_points, minx, miny,
    maxx, maxy); gtype 'invalid' with NULL stats on any violation.
    GeometryCollection nesting (spec: "should be avoided") is capped
    at depth 32 — deeper is invalid, never a RecursionError."""
    bad = ("invalid", None, None, None, None, None, None)
    if not isinstance(geom, dict) or depth > 32:
        return bad
    gtype = geom.get("type")
    if gtype == "GeometryCollection":
        subs = geom.get("geometries")
        if not isinstance(subs, list):
            return bad
        pts: list[tuple[float, float]] = []
        n = total = 0
        for sub in subs:
            st = _geom_stats(sub, depth + 1)
            if st[0] == "invalid":
                return bad
            n += 1
            total += st[2] or 0
            if st[2]:
                pts.extend([(st[3], st[4]), (st[5], st[6])])
        if not pts:
            return ("GeometryCollection", n, 0,
                    None, None, None, None)
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        return ("GeometryCollection", n, total,
                min(xs), min(ys), max(xs), max(ys))
    if gtype not in _DEPTH:
        return bad
    acc: list[tuple[float, float]] = []
    if not _walk(geom.get("coordinates"), _DEPTH[gtype], acc) \
            or not acc:
        return bad
    xs = [p[0] for p in acc]
    ys = [p[1] for p in acc]
    return (gtype, 1, len(acc), min(xs), min(ys), max(xs), max(ys))


def parse_geojson(payload) -> dict:
    """payload -> {"features": [...], "root": str|None}; never
    raises; features empty for junk. Feature row: (pos, gtype,
    n_geoms, n_points, minx, miny, maxx, maxy, name, n_props)."""
    out = {"features": [], "root": None}
    if payload is None:
        return out
    if isinstance(payload, (bytes, bytearray)):
        try:
            src = bytes(payload).decode("utf-8")
        except UnicodeDecodeError:
            return out
    else:
        src = str(payload)
    try:
        doc = json.loads(src)
    except (ValueError, RecursionError):
        return out
    if not isinstance(doc, dict):
        return out
    root = doc.get("type")

    def feature_row(pos: int, feat) -> tuple | None:
        if not isinstance(feat, dict) or feat.get("type") != \
                "Feature":
            return None
        props = feat.get("properties")
        props = props if isinstance(props, dict) else {}
        name = props.get("name")
        name = name if isinstance(name, str) else None
        st = _geom_stats(feat.get("geometry"))
        return (pos,) + st + (name, len(props))

    if root == "FeatureCollection":
        out["root"] = root
        feats = doc.get("features")
        if isinstance(feats, list):
            for f in feats:
                row = feature_row(len(out["features"]), f)
                if row is not None:
                    out["features"].append(row)
    elif root == "Feature":
        out["root"] = root
        row = feature_row(0, doc)
        if row is not None:
            out["features"].append(row)
    elif root in _DEPTH or root == "GeometryCollection":
        out["root"] = "geometry"
        st = _geom_stats(doc)
        out["features"].append((0,) + st + (None, 0))
    return out
