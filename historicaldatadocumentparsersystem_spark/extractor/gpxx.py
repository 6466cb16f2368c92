"""GPX (GPS Exchange Format) track reader — pure Python, stdlib
XML, Spark-free.

The geodata modality of a web corpus: fitness portals, OSM traces,
and hiking sites publish ``.gpx`` tracks. Deterministic subset
(GPX 1.1, namespace-agnostic by local name):

- trackpoints: one row per ``<trkpt>`` in document order with
  (track index, track name, segment index, point index, lat, lon,
  elevation, ISO time + epoch seconds); waypoints (``<wpt>``) join
  the same flat table with kind ``wpt`` (track fields None);
- lat/lon are XML attributes parsed as doubles and RANGE-GATED
  (|lat| <= 90, |lon| <= 180 — out-of-range points drop, the Int32
  clamp lesson applied to coordinates);
- time: ``YYYY-MM-DDTHH:MM:SS(.fff)?Z`` only (fraction truncated);
  epoch via the SAME days-from-civil integer formula cachex uses
  (no datetime module — the formula is the cross-engine contract),
  so track durations are exact BIGINT math downstream;
- distance/speed are deliberately NOT computed here: haversine
  needs transcendentals whose cross-engine IEEE identity is not
  guaranteed — rollups stick to bbox/count/duration (exact).

``build_gpx`` is the encode half for fixtures (must round-trip).
"""

from __future__ import annotations

import re
from xml.etree import ElementTree as ET

_TIME_RE = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})(?:\.\d+)?Z$")


def _local(tag) -> str:
    return tag.split("}")[-1] if isinstance(tag, str) else ""


def _child_text(el, name):
    for c in el:
        if _local(c.tag) == name:
            return c.text
    return None


def iso_to_epoch(value) -> int | None:
    """ISO-8601 Zulu -> epoch seconds (days-from-civil integer
    formula — extractor/cachex.py:72 is the shared contract)."""
    m = _TIME_RE.match(value or "")
    if not m:
        return None
    year, mon, day, hh, mm, ss = (int(g) for g in m.groups())
    y = year - (1 if mon <= 2 else 0)
    era = y // 400
    yoe = y - era * 400
    doy = (153 * (mon + (-3 if mon > 2 else 9)) + 2) // 5 + day - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    days = era * 146097 + doe - 719468
    return days * 86400 + hh * 3600 + mm * 60 + ss


def _coord(el, attr, limit):
    try:
        v = float(el.get(attr, ""))
    except (TypeError, ValueError):
        return None
    return v if -limit <= v <= limit else None


def _ele(el):
    t = _child_text(el, "ele")
    try:
        return float(t) if t is not None else None
    except ValueError:
        return None


def parse_gpx(payload) -> list[dict]:
    """GPX bytes/str -> flat point rows:
    {kind, trk, trk_name, seg, pt, name, lat, lon, ele, time,
    epoch}; never raises (non-GPX -> [])."""
    if payload is None:
        return []
    if isinstance(payload, str):
        payload = payload.encode("utf-8", "replace")
    try:
        root = ET.fromstring(bytes(payload))
    except (ET.ParseError, ValueError, LookupError):
        return []
    if _local(root.tag) != "gpx":
        return []
    rows: list[dict] = []
    trk_idx = 0
    for el in root:
        name = _local(el.tag)
        if name == "wpt":
            lat, lon = _coord(el, "lat", 90), _coord(el, "lon", 180)
            if lat is None or lon is None:
                continue
            t = _child_text(el, "time")
            t = t.strip() if isinstance(t, str) else None
            rows.append({
                "kind": "wpt", "trk": None, "trk_name": None,
                "seg": None, "pt": None,
                "name": _child_text(el, "name"),
                "lat": lat, "lon": lon, "ele": _ele(el),
                "time": t if _TIME_RE.match(t or "") else None,
                "epoch": iso_to_epoch(t)})
        elif name == "trk":
            tname = _child_text(el, "name")
            seg_idx = 0
            for seg in el:
                if _local(seg.tag) != "trkseg":
                    continue
                pt_idx = 0
                for pt in seg:
                    if _local(pt.tag) != "trkpt":
                        continue
                    lat = _coord(pt, "lat", 90)
                    lon = _coord(pt, "lon", 180)
                    if lat is None or lon is None:
                        continue
                    t = _child_text(pt, "time")
                    t = t.strip() if isinstance(t, str) else None
                    ok = _TIME_RE.match(t or "")
                    rows.append({
                        "kind": "trkpt", "trk": trk_idx,
                        "trk_name": tname, "seg": seg_idx,
                        "pt": pt_idx, "name": None,
                        "lat": lat, "lon": lon, "ele": _ele(pt),
                        "time": t if ok else None,
                        "epoch": iso_to_epoch(t)})
                    pt_idx += 1
                seg_idx += 1
            trk_idx += 1
    return rows


def build_gpx(tracks: list[dict], waypoints: list[dict] = (),
              ns: bool = False) -> bytes:
    """Encode half for fixtures. tracks: {name, segments: [[(lat,
    lon, ele|None, time|None), ...], ...]}; waypoints: {name, lat,
    lon, ele|None, time|None}. ``ns=True`` emits the GPX 1.1
    default namespace (parser must be namespace-agnostic)."""
    xmlns = ' xmlns="http://www.topografix.com/GPX/1/1"' if ns \
        else ""
    out = [f'<gpx version="1.1" creator="fixture"{xmlns}>']
    for w in waypoints:
        out.append(f'<wpt lat="{w["lat"]}" lon="{w["lon"]}">')
        if w.get("name") is not None:
            out.append(f"<name>{w['name']}</name>")
        if w.get("ele") is not None:
            out.append(f"<ele>{w['ele']}</ele>")
        if w.get("time") is not None:
            out.append(f"<time>{w['time']}</time>")
        out.append("</wpt>")
    for t in tracks:
        out.append("<trk>")
        if t.get("name") is not None:
            out.append(f"<name>{t['name']}</name>")
        for seg in t["segments"]:
            out.append("<trkseg>")
            for lat, lon, ele, time in seg:
                out.append(f'<trkpt lat="{lat}" lon="{lon}">')
                if ele is not None:
                    out.append(f"<ele>{ele}</ele>")
                if time is not None:
                    out.append(f"<time>{time}</time>")
                out.append("</trkpt>")
            out.append("</trkseg>")
        out.append("</trk>")
    out.append("</gpx>")
    return "".join(out).encode("utf-8")
