"""HLS (M3U8) playlist parsing — video fetch planning (Spark-free,
pure Python, RFC 8216).

A video corpus at scale is fetched segment-by-segment: the master
playlist declares the variant ladder (bandwidth/resolution/codecs),
media playlists declare the segment URIs with exact durations. This
module parses both so the fetch planner can pick a ladder rung and
budget bytes/seconds per asset — the same discovery-to-frontier shape
as sitemaps (loc rows joining the fetch frontier).

Determinism contract (``parse_m3u8`` returns ``(kind, rows)``; never
raises — F5):

- ``kind`` is 'master' when any ``#EXT-X-STREAM-INF`` tag is present,
  'media' when any ``#EXTINF`` is, 'unknown' otherwise (bytes that
  don't start with ``#EXTM3U`` after BOM/whitespace strip are
  'unknown' with no rows);
- master rows: ``('variant', pos, uri, bandwidth, width, height,
  codecs)`` — one per STREAM-INF tag paired with the NEXT
  non-blank non-tag line (its URI; a STREAM-INF with no following
  URI line is dropped); BANDWIDTH is int (None when absent/bad),
  RESOLUTION ``WxH`` split into ints, CODECS kept verbatim
  (unquoted); and ``('media', pos, uri, type_, language, name)`` —
  one per ``#EXT-X-MEDIA`` tag carrying a URI attribute, TYPE/
  LANGUAGE lowercased;
- media-playlist rows: ``('segment', pos, uri, duration_ms,
  title)`` — one per EXTINF paired with the next URI line; the
  duration is parsed as EXACT decimal -> integer milliseconds
  (no float: '6.006' -> 6006, truncation past 3 fraction digits),
  None when malformed; ``title`` is the text after the comma or
  None;
- ``pos`` is dense from 0 per playlist across row kinds, document
  order; attribute lists are split on TOP-LEVEL commas (quoted
  strings may contain commas), keys uppercased, quotes stripped.
"""
from __future__ import annotations

def _attrs(s: str) -> dict[str, str]:
    """KEY=VALUE attribute list with quoted-string commas."""
    out: dict[str, str] = {}
    i, n = 0, len(s)
    while i < n:
        eq = s.find("=", i)
        if eq < 0:
            break
        key = s[i:eq].strip().upper()
        j = eq + 1
        if j < n and s[j] == '"':
            end = s.find('"', j + 1)
            if end < 0:
                break
            val = s[j + 1:end]
            nxt = s.find(",", end + 1)
            i = n if nxt < 0 else nxt + 1
        else:
            end = s.find(",", j)
            if end < 0:
                val, i = s[j:], n
            else:
                val, i = s[j:end], end + 1
        if key:
            out[key] = val.strip()
    return out


def _duration_ms(s: str) -> int | None:
    """Exact decimal seconds -> integer ms, float-free."""
    s = s.strip()
    if not s:
        return None
    neg = s.startswith("-")
    if neg:
        return None
    whole, _, frac = s.partition(".")
    if not (whole or frac) or not (whole or "0").isdigit() \
            or (frac and not frac.isdigit()):
        return None
    ms = int(whole or "0") * 1000
    frac = (frac + "000")[:3]
    ms += int(frac or "0")
    # crawled manifests are adversarial: absurd durations stay None
    # rather than overflowing a BIGINT downstream
    return ms if ms < (1 << 62) else None


def parse_m3u8(payload) -> tuple[str, list[tuple]]:
    """(kind, rows) — see the module contract."""
    if isinstance(payload, (bytes, bytearray, memoryview)):
        text = bytes(payload).decode("utf-8", errors="replace")
    else:
        text = payload or ""
    lines = [ln.strip() for ln in
             text.lstrip("\ufeff \t\r\n").splitlines()]
    if not lines or not lines[0].startswith("#EXTM3U"):
        return "unknown", []
    rows: list[tuple] = []
    kind = "unknown"
    pending = None           # ('variant', ...) or ('segment', ...)
    for ln in lines[1:]:
        if not ln:
            continue
        if ln.startswith("#EXT-X-STREAM-INF:"):
            kind = "master"
            a = _attrs(ln.split(":", 1)[1])
            try:
                bw = int(a["BANDWIDTH"])
            except (KeyError, ValueError):
                bw = None
            if bw is not None and not 0 <= bw < (1 << 62):
                bw = None               # adversarial-value clamp
            w = h = None
            res = a.get("RESOLUTION", "")
            if "x" in res.lower():
                xs = res.lower().split("x")
                if len(xs) == 2 and xs[0].isdigit() and xs[1].isdigit():
                    w, h = int(xs[0]), int(xs[1])
                    if not (0 < w < (1 << 31)
                            and 0 < h < (1 << 31)):
                        w = h = None
            pending = ("variant", bw, w, h, a.get("CODECS"))
        elif ln.startswith("#EXT-X-MEDIA:"):
            a = _attrs(ln.split(":", 1)[1])
            uri = a.get("URI")
            if uri:
                rows.append(("media", len(rows), uri,
                             (a.get("TYPE") or "").lower() or None,
                             (a.get("LANGUAGE") or "").lower() or None,
                             a.get("NAME")))
        elif ln.startswith("#EXTINF:"):
            if kind != "master":
                kind = "media"
            body = ln.split(":", 1)[1]
            dur, _, title = body.partition(",")
            pending = ("segment", _duration_ms(dur),
                       title.strip() or None)
        elif ln.startswith("#"):
            continue
        elif pending is not None:
            if pending[0] == "variant":
                _, bw, w, h, codecs = pending
                rows.append(("variant", len(rows), ln, bw, w, h,
                             codecs))
            else:
                _, dur, title = pending
                rows.append(("segment", len(rows), ln, dur, title))
            pending = None
    return kind, rows


def build_master(variants: list[dict],
                 media: list[dict] | None = None) -> bytes:
    """Serialize a master playlist — fixture generator + round-trip
    witness. variants: {uri, bandwidth, width?, height?, codecs?};
    media: {uri, type_, language?, name?}."""
    lines = ["#EXTM3U"]
    for m in media or []:
        parts = [f'TYPE={m["type_"].upper()}',
                 f'URI="{m["uri"]}"']
        if m.get("language"):
            parts.append(f'LANGUAGE="{m["language"]}"')
        if m.get("name"):
            parts.append(f'NAME="{m["name"]}"')
        lines.append("#EXT-X-MEDIA:" + ",".join(parts))
    for v in variants:
        parts = [f'BANDWIDTH={v["bandwidth"]}']
        if v.get("width"):
            parts.append(f'RESOLUTION={v["width"]}x{v["height"]}')
        if v.get("codecs"):
            parts.append(f'CODECS="{v["codecs"]}"')
        lines.append("#EXT-X-STREAM-INF:" + ",".join(parts))
        lines.append(v["uri"])
    return "\n".join(lines).encode("utf-8")


def build_media(segments: list[dict], target_duration: int = 10,
                endlist: bool = True) -> bytes:
    """Serialize a media playlist — fixture generator + round-trip
    witness. segments: {uri, duration_ms, title?}."""
    lines = ["#EXTM3U", "#EXT-X-VERSION:3",
             f"#EXT-X-TARGETDURATION:{target_duration}",
             "#EXT-X-MEDIA-SEQUENCE:0"]
    for s in segments:
        ms = s["duration_ms"]
        dur = f"{ms // 1000}.{ms % 1000:03d}"
        title = s.get("title")
        lines.append(f"#EXTINF:{dur},{title or ''}".rstrip(","))
        lines.append(s["uri"])
    if endlist:
        lines.append("#EXT-X-ENDLIST")
    return "\n".join(lines).encode("utf-8")
