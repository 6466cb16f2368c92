"""iCalendar (RFC 5545) event reader — pure Python, stdlib only.

Calendar files are a structured-event discovery channel the crawl
side keeps hitting (conference sites, venue pages, .ics feeds behind
``rel="alternate"`` links); a training pipeline mines them for
(time, title, place) records the way it mines JSON-LD ``Event``
items. The reference's loader family is per-format dispatch
(``loaders.py``); this is the calendar member, emitting one row per
VEVENT so downstream SQL can window/join on time.

Determinism contract (mirrored by the DuckDB twin via the committed
golden parquet — the extract_links pattern):
- decoding: BOM-aware UTF-8; BOM-less bytes try STRICT UTF-8 first,
  then cp1252 (the legacy export page) — errors never raise;
- unfolding per RFC 5545 §3.1: a line starting with SPACE or HTAB
  continues the previous line with the CRLF + one WSP removed
  (CR/LF/CRLF all accepted as line breaks);
- content lines are ``NAME[;PARAM=VAL[,VAL]...]:value`` — the
  name/params/value split scans OUTSIDE double quotes (quoted param
  values may contain ``:;,``); names and param names uppercase;
- TEXT values unescape left-to-right: ``\\n``/``\\N`` -> newline,
  ``\\\\`` -> backslash, ``\\;`` ``\\,`` -> literal — other escapes
  keep the escaped char (lenient, matches common parsers);
- only properties of the VEVENT component itself count: nested
  components (VALARM) are tracked on a depth stack and their
  properties never bleed into the event;
- DATE-TIME forms: ``YYYYMMDD`` (VALUE=DATE or bare 8 digits) ->
  midnight, all_day=True; ``YYYYMMDDTHHMMSS`` with optional ``Z``.
  All forms resolve on the proleptic Gregorian calendar to epoch
  milliseconds with NO timezone database — a TZID parameter is
  recorded verbatim in the ``tzid`` column and the local wall time
  is mapped as if UTC (the deterministic subset; real tz resolution
  is a data swap on that column, not a code change). Invalid dates
  (month 13, Feb 30) drop the property;
- DTEND wins over DURATION; DURATION is RFC 5545 §3.3.6
  ``[+-]P[nW][nD][T[nH][nM][nS]]`` folded to exact integer seconds
  (durations over ~317 years drop — int64-ms overflow guard for the
  attribute-fed-allocation rule); an event with neither gets
  ``end_ms = start_ms``;
- an event without a parseable DTSTART is dropped, never an error
  (F5); a payload with no VEVENT yields an empty list;
- RRULE: FREQ / INTERVAL / COUNT / UNTIL are parsed (others pass
  through unharvested); INTERVAL defaults to 1, clamps to [1, 1e6];
  COUNT clamps to [1, 1e6]; UNTIL accepts both DATE and DATE-TIME;
- ``pos`` numbers emitted events densely from 0 in file order.

Spark-free like the rest of ``extractor/`` (it IS the oracle; the
Spark source calls the same function per row). Reference anchor:
the per-format loader dispatch in ``loaders.py`` (semantic analog —
the reference has no calendar loader; this extends the family the
way feedx/subx/rtfx do).
"""

from __future__ import annotations

import re
from datetime import datetime

_EPOCH = datetime(1970, 1, 1)
_DT_RE = re.compile(r"^(\d{8})(?:T(\d{2})(\d{2})(\d{2})(Z?))?$")
_DUR_RE = re.compile(
    r"^([+-]?)P(?:(\d+)W)?(?:(\d+)D)?"
    r"(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+)S)?)?$")

_CLAMP = 1_000_000


def _decode(payload: bytes) -> str:
    if payload.startswith(b"\xef\xbb\xbf"):
        return payload[3:].decode("utf-8", errors="replace")
    try:
        return payload.decode("utf-8")
    except UnicodeDecodeError:
        return payload.decode("cp1252", errors="replace")


def unfold_lines(src: str) -> list[str]:
    """RFC 5545 §3.1 unfolding: SPACE/HTAB-led lines continue the
    previous physical line (the break + ONE leading WSP removed)."""
    out: list[str] = []
    for line in src.replace("\r\n", "\n").replace("\r", "\n").split("\n"):
        if line[:1] in (" ", "\t") and out:
            out[-1] += line[1:]
        elif line:
            out.append(line)
    return out


def parse_content_line(line: str):
    """``NAME;P=V;Q="a:b":value`` -> (NAME, {P: V, ...}, value) with
    the name/value split scanned outside double quotes. Returns None
    for lines without an unquoted ``:``."""
    params: dict[str, str] = {}
    in_quote = False
    colon = -1
    for i, ch in enumerate(line):
        if ch == '"':
            in_quote = not in_quote
        elif ch == ":" and not in_quote:
            colon = i
            break
    if colon < 0:
        return None
    head, value = line[:colon], line[colon + 1:]
    # split params on ';' outside quotes
    parts: list[str] = []
    buf: list[str] = []
    in_quote = False
    for ch in head:
        if ch == '"':
            in_quote = not in_quote
            buf.append(ch)
        elif ch == ";" and not in_quote:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    name = parts[0].strip().upper()
    if not name:
        return None
    for p in parts[1:]:
        if "=" not in p:
            continue
        k, v = p.split("=", 1)
        params[k.strip().upper()] = v.strip().strip('"')
    return name, params, value


def unescape_text(value: str) -> str:
    """RFC 5545 §3.3.11 TEXT unescaping, left-to-right."""
    out: list[str] = []
    i, n = 0, len(value)
    while i < n:
        ch = value[i]
        if ch == "\\" and i + 1 < n:
            nxt = value[i + 1]
            if nxt in ("n", "N"):
                out.append("\n")
            else:
                out.append(nxt)   # \\ \; \, and lenient others
            i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def parse_datetime(value: str, params: dict[str, str]):
    """DATE / DATE-TIME -> (epoch_ms, all_day) or None. Floating and
    TZID-local wall times map as if UTC (see module contract)."""
    m = _DT_RE.match(value.strip())
    if not m:
        return None
    ymd, hh, mm, ss = m.group(1), m.group(2), m.group(3), m.group(4)
    all_day = hh is None or params.get("VALUE") == "DATE"
    try:
        dt = datetime(int(ymd[:4]), int(ymd[4:6]), int(ymd[6:8]),
                      0 if all_day else int(hh),
                      0 if all_day else int(mm),
                      0 if all_day else int(ss))
    except ValueError:
        return None
    return int((dt - _EPOCH).total_seconds()) * 1000, all_day


def parse_duration(value: str):
    """RFC 5545 §3.3.6 duration -> signed integer seconds, or None."""
    m = _DUR_RE.match(value.strip())
    if not m or value.strip() in ("P", "+P", "-P"):
        return None
    sign, w, d, h, mi, s = m.groups()
    if not any((w, d, h, mi, s)):
        return None
    total = (int(w or 0) * 604800 + int(d or 0) * 86400
             + int(h or 0) * 3600 + int(mi or 0) * 60 + int(s or 0))
    if total > 10_000_000_000:   # ~317 years: int64-ms overflow guard
        return None
    return -total if sign == "-" else total


def parse_rrule(value: str):
    """RRULE value -> (freq, interval, count, until_ms). Unknown or
    absent parts come back None (interval None only if unparseable)."""
    freq = None
    interval = 1
    count = None
    until_ms = None
    for part in value.split(";"):
        if "=" not in part:
            continue
        k, v = part.split("=", 1)
        k = k.strip().upper()
        v = v.strip()
        if k == "FREQ":
            vu = v.upper()
            if vu in ("SECONDLY", "MINUTELY", "HOURLY", "DAILY",
                      "WEEKLY", "MONTHLY", "YEARLY"):
                freq = vu
        elif k == "INTERVAL" and v.isdigit():
            interval = min(max(int(v), 1), _CLAMP)
        elif k == "COUNT" and v.isdigit():
            count = min(max(int(v), 1), _CLAMP)
        elif k == "UNTIL":
            got = parse_datetime(v.upper(), {})
            if got:
                until_ms = got[0]
    return freq, interval, count, until_ms


def parse_ics(payload) -> list[dict]:
    """Decode + unfold + walk components; one dict per VEVENT:
    (pos, uid, summary, location, start_ms, end_ms, all_day, tzid,
    freq, rrule_interval, rrule_count, until_ms, status). Bytes
    without a parseable event yield an empty list, never raise."""
    if isinstance(payload, (bytes, bytearray, memoryview)):
        src = _decode(bytes(payload))
    else:
        src = payload or ""
    out: list[dict] = []
    stack: list[str] = []
    ev: dict | None = None
    for line in unfold_lines(src):
        got = parse_content_line(line)
        if got is None:
            continue
        name, params, value = got
        if name == "BEGIN":
            comp = value.strip().upper()
            stack.append(comp)
            if comp == "VEVENT" and stack.count("VEVENT") == 1:
                ev = {"uid": None, "summary": None, "location": None,
                      "start": None, "end_ms": None, "dur_s": None,
                      "tzid": None, "freq": None, "interval": 1,
                      "count": None, "until_ms": None, "status": None}
            continue
        if name == "END":
            comp = value.strip().upper()
            # pop to the matching BEGIN (lenient on mismatches)
            while stack:
                top = stack.pop()
                if top == comp:
                    break
            if comp == "VEVENT" and ev is not None \
                    and "VEVENT" not in stack:
                if ev["start"] is not None:
                    start_ms, all_day = ev["start"]
                    end_ms = ev["end_ms"]
                    if end_ms is None and ev["dur_s"] is not None:
                        end_ms = start_ms + ev["dur_s"] * 1000
                    if end_ms is None:
                        end_ms = start_ms
                    out.append({
                        "pos": len(out), "uid": ev["uid"],
                        "summary": ev["summary"],
                        "location": ev["location"],
                        "start_ms": start_ms, "end_ms": end_ms,
                        "all_day": all_day, "tzid": ev["tzid"],
                        "freq": ev["freq"],
                        "rrule_interval": ev["interval"],
                        "rrule_count": ev["count"],
                        "until_ms": ev["until_ms"],
                        "status": ev["status"]})
                ev = None
            continue
        # only direct VEVENT properties count (VALARM must not bleed)
        if ev is None or stack[-1:] != ["VEVENT"]:
            continue
        if name == "UID" and ev["uid"] is None:
            ev["uid"] = unescape_text(value).strip() or None
        elif name == "SUMMARY" and ev["summary"] is None:
            ev["summary"] = unescape_text(value).strip() or None
        elif name == "LOCATION" and ev["location"] is None:
            ev["location"] = unescape_text(value).strip() or None
        elif name == "STATUS" and ev["status"] is None:
            ev["status"] = value.strip().upper() or None
        elif name == "DTSTART" and ev["start"] is None:
            ev["start"] = parse_datetime(value, params)
            if ev["start"] is not None and "TZID" in params:
                ev["tzid"] = params["TZID"] or None
        elif name == "DTEND" and ev["end_ms"] is None:
            got_end = parse_datetime(value, params)
            if got_end is not None:
                ev["end_ms"] = got_end[0]
        elif name == "DURATION" and ev["dur_s"] is None:
            ev["dur_s"] = parse_duration(value)
        elif name == "RRULE" and ev["freq"] is None:
            freq, interval, count, until_ms = parse_rrule(value)
            ev["freq"] = freq
            ev["interval"] = interval
            ev["count"] = count
            ev["until_ms"] = until_ms
    return out
