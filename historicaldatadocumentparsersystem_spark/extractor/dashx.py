"""DASH MPD manifest parsing — the other half of video fetch
planning (Spark-free, pure Python, stdlib ElementTree; ISO/IEC
23009-1 subset).

HLS (extractor/hlsx.py) and DASH split the streaming web between
them; a video-corpus fetch planner needs both. The MPD declares
Periods > AdaptationSets > Representations with bandwidth/resolution
/codecs and a SegmentTemplate addressing scheme — enough to pick a
ladder rung and enumerate segment URLs.

Determinism contract (``parse_mpd`` returns ``(meta, rows)``; never
raises — F5):

- ``meta`` = {type ('static' | 'dynamic', the @type default
  'static'), duration_ms, min_buffer_ms} — ISO-8601 durations
  (``PT#H#M#S`` with decimal seconds) parsed EXACTLY to integer ms,
  float-free, None when absent/malformed/absurd (>= 2^62 ms);
- one row per Representation in document order, ``pos`` dense from
  0: (pos, period, adaptation, content_type, lang, rep_id,
  bandwidth, width, height, codecs, mime_type, base_url, init_uri,
  media_template, seg_duration_ms, start_number);
- spec INHERITANCE: width/height/codecs/mimeType on the
  Representation override the AdaptationSet's; SegmentTemplate at
  Representation level overrides the AdaptationSet's;
  ``content_type`` is @contentType or the mimeType's major type;
  ``lang`` lowercased;
- ``base_url`` is the NEAREST BaseURL text (Representation >
  AdaptationSet > Period > MPD), unresolved (the Spark op resolves
  against the manifest url); ``init_uri``/``media_template`` come
  from SegmentTemplate @initialization/@media verbatim ($Number$
  etc. preserved); ``seg_duration_ms`` = @duration * 1000 //
  @timescale exactly (timescale default 1, the spec's);
- adversarial-value clamps (the hlsx rule): bandwidth outside
  [0, 2^62), dimensions outside (0, 2^31), durations >= 2^62 ms and
  start numbers outside [0, 2^62) become None;
- non-XML / non-MPD payloads degrade to ({type: None, ...}, []).
"""
from __future__ import annotations

import re

_DUR_RE = re.compile(
    r"^P(?:(\d+)D)?(?:T(?:(\d+)H)?(?:(\d+)M)?"
    r"(?:(\d+(?:\.\d+)?)S)?)?$")


def _iso_ms(s: str | None) -> int | None:
    """ISO-8601 duration -> exact integer ms (float-free)."""
    if not s:
        return None
    m = _DUR_RE.match(s.strip())
    if not m or not any(m.groups()):
        return None
    days, hours, mins, secs = m.groups()
    ms = (int(days or 0) * 86_400_000 + int(hours or 0) * 3_600_000
          + int(mins or 0) * 60_000)
    if secs:
        whole, _, frac = secs.partition(".")
        ms += int(whole or 0) * 1000 + int((frac + "000")[:3] or 0)
    return ms if ms < (1 << 62) else None


def _clamp(v: str | None, hi: int, lo: int = 0) -> int | None:
    if v is None:
        return None
    try:
        n = int(v)
    except ValueError:
        return None
    return n if lo <= n < hi else None


def _local(tag) -> str:
    return tag.split("}")[-1] if isinstance(tag, str) else ""


def _child_text(el, name: str) -> str | None:
    for c in el:
        if _local(c.tag) == name and c.text and c.text.strip():
            return c.text.strip()
    return None


def _child(el, name: str):
    for c in el:
        if _local(c.tag) == name:
            return c
    return None


def parse_mpd(payload) -> tuple[dict, list[tuple]]:
    """(meta, representation rows) — see the module contract."""
    from xml.etree import ElementTree as ET
    if isinstance(payload, (bytes, bytearray, memoryview)):
        data = bytes(payload)
    else:
        data = (payload or "").encode("utf-8")
    meta = {"type": None, "duration_ms": None, "min_buffer_ms": None}
    try:
        root = ET.fromstring(data)
    except (ET.ParseError, ValueError, LookupError):
        return meta, []
    if _local(root.tag) != "MPD":
        return meta, []
    meta["type"] = root.get("type", "static")
    meta["duration_ms"] = _iso_ms(root.get("mediaPresentationDuration"))
    meta["min_buffer_ms"] = _iso_ms(root.get("minBufferTime"))
    mpd_base = _child_text(root, "BaseURL")
    rows: list[tuple] = []
    p_idx = 0
    for period in root:
        if _local(period.tag) != "Period":
            continue
        per_base = _child_text(period, "BaseURL") or mpd_base
        a_idx = 0
        for aset in period:
            if _local(aset.tag) != "AdaptationSet":
                continue
            a_base = _child_text(aset, "BaseURL") or per_base
            a_tmpl = _child(aset, "SegmentTemplate")
            a_mime = aset.get("mimeType")
            ctype = aset.get("contentType") \
                or (a_mime.split("/")[0] if a_mime else None)
            lang = (aset.get("lang") or "").strip().lower() or None
            for rep in aset:
                if _local(rep.tag) != "Representation":
                    continue
                # explicit None test: a childless ET Element is FALSY
                tmpl = _child(rep, "SegmentTemplate")
                if tmpl is None:
                    tmpl = a_tmpl
                init = media = None
                seg_ms = start = None
                if tmpl is not None:
                    init = tmpl.get("initialization")
                    media = tmpl.get("media")
                    dur = _clamp(tmpl.get("duration"), 1 << 62)
                    ts = _clamp(tmpl.get("timescale"), 1 << 62, 1) \
                        or 1
                    if dur is not None:
                        seg_ms = dur * 1000 // ts
                        if seg_ms >= (1 << 62):
                            seg_ms = None
                    start = _clamp(tmpl.get("startNumber"), 1 << 62)
                mime = rep.get("mimeType") or a_mime
                rows.append((
                    len(rows), p_idx, a_idx,
                    ctype or (mime.split("/")[0] if mime else None),
                    lang, rep.get("id"),
                    _clamp(rep.get("bandwidth"), 1 << 62),
                    _clamp(rep.get("width"), 1 << 31, 1),
                    _clamp(rep.get("height"), 1 << 31, 1),
                    rep.get("codecs") or aset.get("codecs"),
                    mime,
                    _child_text(rep, "BaseURL") or a_base,
                    init, media, seg_ms, start))
            a_idx += 1
        p_idx += 1
    return meta, rows


def build_mpd(periods: list[list[dict]], mpd_type: str = "static",
              duration_ms: int | None = None,
              min_buffer_ms: int | None = 2000) -> bytes:
    """Serialize Periods of AdaptationSet dicts into a valid MPD —
    fixture generator + round-trip witness. Each adaptation dict:
    {content_type?, mime_type?, lang?, codecs?, base_url?,
    template?: {initialization?, media?, duration, timescale?,
    start_number?}, representations: [{id, bandwidth, width?,
    height?, codecs?, mime_type?, base_url?, template?}]}."""
    def dur(ms: int) -> str:
        return f"PT{ms // 1000}.{ms % 1000:03d}S"

    def tmpl_xml(t: dict) -> str:
        parts = ["<SegmentTemplate"]
        if t.get("initialization"):
            parts.append(f' initialization="{t["initialization"]}"')
        if t.get("media"):
            parts.append(f' media="{t["media"]}"')
        if t.get("duration") is not None:
            parts.append(f' duration="{t["duration"]}"')
        if t.get("timescale") is not None:
            parts.append(f' timescale="{t["timescale"]}"')
        if t.get("start_number") is not None:
            parts.append(f' startNumber="{t["start_number"]}"')
        return "".join(parts) + "/>"

    lines = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<MPD xmlns="urn:mpeg:dash:schema:mpd:2011" '
             f'type="{mpd_type}"'
             + (f' mediaPresentationDuration="{dur(duration_ms)}"'
                if duration_ms is not None else "")
             + (f' minBufferTime="{dur(min_buffer_ms)}"'
                if min_buffer_ms is not None else "")
             + ">"]
    for adaptations in periods:
        lines.append("<Period>")
        for a in adaptations:
            attrs = ""
            for key, attr in (("content_type", "contentType"),
                              ("mime_type", "mimeType"),
                              ("lang", "lang"), ("codecs", "codecs")):
                if a.get(key):
                    attrs += f' {attr}="{a[key]}"'
            lines.append(f"<AdaptationSet{attrs}>")
            if a.get("base_url"):
                lines.append(f'<BaseURL>{a["base_url"]}</BaseURL>')
            if a.get("template"):
                lines.append(tmpl_xml(a["template"]))
            for r in a["representations"]:
                rattrs = f' id="{r["id"]}"' \
                    f' bandwidth="{r["bandwidth"]}"'
                for key, attr in (("width", "width"),
                                  ("height", "height"),
                                  ("codecs", "codecs"),
                                  ("mime_type", "mimeType")):
                    if r.get(key) is not None:
                        rattrs += f' {attr}="{r[key]}"'
                body = ""
                if r.get("base_url"):
                    body += f'<BaseURL>{r["base_url"]}</BaseURL>'
                if r.get("template"):
                    body += tmpl_xml(r["template"])
                if body:
                    lines.append(f"<Representation{rattrs}>"
                                 f"{body}</Representation>")
                else:
                    lines.append(f"<Representation{rattrs}/>")
            lines.append("</AdaptationSet>")
        lines.append("</Period>")
    lines.append("</MPD>")
    return "\n".join(lines).encode("utf-8")
