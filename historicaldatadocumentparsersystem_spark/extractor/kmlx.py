"""KML placemark reader — pure Python over the OGC KML 2.2 subset,
Spark-free.

The ``gpxx`` sibling for the OTHER geodata dialect the web serves
(Google Earth exports, municipal open-data portals): one flat row
per Placemark with the Document/Folder nesting as a "/"-joined
path (the opml/bookmarks convention), the geometry reduced to a
type + vertex census + exact bbox (KML coordinates are
``lon,lat[,alt]`` — the REVERSE of GPX's attribute order), and
TimeStamp/TimeSpan instants as epoch seconds via the shared
days-from-civil integer formula (``gpxx.iso_to_epoch``).

MultiGeometry counts every member's vertices and takes the overall
bbox with the FIRST member's type label prefixed ``multi:``.
Coordinates are range-gated (the clamp rule applied to lat/lon);
out-of-range tuples are dropped, a Placemark whose geometry has no
valid vertex keeps NULL bbox. No haversine — transcendentals have
no cross-engine IEEE guarantee (the gpxx rule).
"""

from __future__ import annotations

from xml.etree import ElementTree as ET

from .gpxx import _local, iso_to_epoch

_GEOMS = ("Point", "LineString", "LinearRing", "Polygon")


def _coords_text(el) -> list[tuple[float, float]]:
    """<coordinates> text -> [(lon, lat)], range-gated."""
    out: list[tuple[float, float]] = []
    for tok in (el.text or "").split():
        parts = tok.split(",")
        if len(parts) < 2:
            continue
        try:
            lon, lat = float(parts[0]), float(parts[1])
        except ValueError:
            continue
        if -180.0 <= lon <= 180.0 and -90.0 <= lat <= 90.0:
            out.append((lon, lat))
    return out


def _geom_points(el, depth: int = 0
                 ) -> tuple[str | None, list[tuple[float, float]]]:
    """geometry element -> (type label, vertices)."""
    if depth > 8:
        return None, []
    tag = _local(el.tag)
    if tag in ("Point", "LineString", "LinearRing"):
        for c in el:
            if _local(c.tag) == "coordinates":
                return tag, _coords_text(c)
        return tag, []
    if tag == "Polygon":
        pts: list[tuple[float, float]] = []
        for c in el:
            if _local(c.tag) in ("outerBoundaryIs",
                                 "innerBoundaryIs"):
                for ring in c:
                    if _local(ring.tag) == "LinearRing":
                        pts += _geom_points(ring, depth + 1)[1]
        return tag, pts
    if tag == "MultiGeometry":
        first = None
        pts = []
        for c in el:
            t, p = _geom_points(c, depth + 1)
            if t is None:
                continue
            first = first or t
            pts += p
        return (f"multi:{first}" if first else None), pts
    return None, []


def parse_kml(payload) -> list[dict]:
    """KML bytes/str -> placemark rows: {pos, folder, name, gtype,
    n_points, min_lon, min_lat, max_lon, max_lat, t_begin, t_end};
    [] for junk / non-KML XML. Never raises."""
    if payload is None:
        return []
    if isinstance(payload, str):
        payload = payload.encode("utf-8", "replace")
    try:
        root = ET.fromstring(bytes(payload))
    except (ET.ParseError, ValueError, LookupError):
        return []
    if _local(root.tag) != "kml":
        return []
    rows: list[dict] = []

    def text_of(el, name):
        for c in el:
            if _local(c.tag) == name:
                return (c.text or "").strip() or None
        return None

    def walk(el, folder: str, depth: int) -> None:
        if depth > 32:
            return
        for c in el:
            tag = _local(c.tag)
            if tag in ("Document", "Folder"):
                fname = text_of(c, "name")
                child = (f"{folder}/{fname}" if folder and fname
                         else (fname or folder))
                walk(c, child, depth + 1)
            elif tag == "Placemark":
                gtype = None
                pts: list[tuple[float, float]] = []
                t0 = t1 = None
                for g in c:
                    gt = _local(g.tag)
                    if gt in _GEOMS or gt == "MultiGeometry":
                        gtype, pts = _geom_points(g)
                    elif gt == "TimeStamp":
                        w = text_of(g, "when")
                        t0 = t1 = iso_to_epoch(w) \
                            if w else None
                    elif gt == "TimeSpan":
                        b = text_of(g, "begin")
                        e = text_of(g, "end")
                        t0 = iso_to_epoch(b) if b else None
                        t1 = iso_to_epoch(e) if e else None
                lons = [p[0] for p in pts]
                lats = [p[1] for p in pts]
                rows.append({
                    "pos": len(rows),
                    "folder": folder or None,
                    "name": text_of(c, "name"),
                    "gtype": gtype,
                    "n_points": len(pts),
                    "min_lon": min(lons) if lons else None,
                    "min_lat": min(lats) if lats else None,
                    "max_lon": max(lons) if lons else None,
                    "max_lat": max(lats) if lats else None,
                    "t_begin": t0, "t_end": t1})

    try:
        walk(root, "", 0)
    except RecursionError:
        pass
    return rows


# --- encode half (fixtures) --------------------------------------------------

def build_kml(folders: list[dict]) -> bytes:
    """[{name, placemarks: [{name, gtype, coords: [(lon, lat)],
    when | span: (b, e)}], folders: [...]}] -> KML bytes."""
    def esc(s):
        return (str(s).replace("&", "&amp;").replace("<", "&lt;")
                .replace(">", "&gt;"))

    def coords(c):
        return " ".join(f"{lon},{lat},0" for lon, lat in c)

    def geom(p):
        g = p.get("gtype", "Point")
        cs = coords(p.get("coords", []))
        if g == "Point":
            return f"<Point><coordinates>{cs}</coordinates></Point>"
        if g == "LineString":
            return (f"<LineString><coordinates>{cs}"
                    "</coordinates></LineString>")
        if g == "Polygon":
            return ("<Polygon><outerBoundaryIs><LinearRing>"
                    f"<coordinates>{cs}</coordinates>"
                    "</LinearRing></outerBoundaryIs></Polygon>")
        if g == "MultiGeometry":
            inner = "".join(geom(m) for m in p["members"])
            return f"<MultiGeometry>{inner}</MultiGeometry>"
        raise ValueError(g)

    def pm(p):
        t = ""
        if "when" in p:
            t = (f"<TimeStamp><when>{p['when']}</when>"
                 "</TimeStamp>")
        elif "span" in p:
            b, e = p["span"]
            t = (f"<TimeSpan><begin>{b}</begin>"
                 f"<end>{e}</end></TimeSpan>")
        return (f"<Placemark><name>{esc(p['name'])}</name>{t}"
                f"{geom(p)}</Placemark>")

    def fold(f):
        inner = "".join(pm(p) for p in f.get("placemarks", []))
        inner += "".join(fold(sub) for sub in f.get("folders", []))
        return (f"<Folder><name>{esc(f['name'])}</name>{inner}"
                "</Folder>")

    body = "".join(fold(f) for f in folders)
    return (('<?xml version="1.0" encoding="UTF-8"?>'
             '<kml xmlns="http://www.opengis.net/kml/2.2">'
             f"<Document><name>doc</name>{body}</Document></kml>")
            .encode("utf-8"))
