"""Subtitle (SRT / WebVTT) cue reader — pure Python, stdlib only.

Timed text is the TEXT half of the video modality: a training
pipeline that samples video frames (operators/multimodal.py) pairs
them with the transcript cues, and subtitle files are the web's
dominant transcript carrier. The reference's loader family is
per-format dispatch (``loaders.py``); this is the timed-text member,
emitting one row per cue so downstream SQL can window/join on time.

Determinism contract:
- format detection: a ``WEBVTT`` magic line (after BOM strip) -> VTT,
  anything else parses as SRT;
- decoding: BOM-aware (UTF-8/16LE/16BE); BOM-less bytes try STRICT
  UTF-8 first, then cp1252 (the classic legacy subtitle page) —
  errors never raise;
- SRT blocks split on blank lines; the numeric index line is
  OPTIONAL (tolerant of the renumbering sloppiness in the wild);
  timestamps ``HH:MM:SS,mmm --> HH:MM:SS,mmm`` accept ``.`` for
  ``,`` and 1-2 hour digits; a block without a parseable timestamp
  line is dropped, never an error;
- VTT: header block (incl. metadata lines) skipped; ``NOTE`` /
  ``STYLE`` / ``REGION`` blocks skipped; the optional cue-id line is
  anything without ``-->``; hours are optional (``MM:SS.mmm``); cue
  settings after the end stamp are ignored;
- cue text: lines joined with ``\\n``; inline markup stripped —
  HTML-ish tags (``<i> <b> <c.cls> <v Name> <00:00:01.000>``) and
  ASS override blocks (``{\\an8}``); VTT character entities
  unescaped (SRT too — harmless there, players do the same);
  whitespace-only cues are dropped;
- ``pos`` numbers emitted cues densely from 0 in file order (cue
  times may overlap/regress in the wild — order is FILE order);
- start/end are integer milliseconds.

Spark-free like the rest of ``extractor/`` (it IS the oracle; the
Spark source calls the same function per row).
"""

from __future__ import annotations

import re
from html import unescape

_TS_SRT = re.compile(
    r"(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})\s*-->\s*"
    r"(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})")
_TS_VTT = re.compile(
    r"(?:(\d{1,2}):)?(\d{2}):(\d{2})\.(\d{3})\s*-->\s*"
    r"(?:(\d{1,2}):)?(\d{2}):(\d{2})\.(\d{3})")
_TAG_RE = re.compile(r"<[^>\n]*>|\{\\[^}\n]*\}")


def _decode(payload: bytes) -> str:
    if payload.startswith(b"\xef\xbb\xbf"):
        return payload[3:].decode("utf-8", errors="replace")
    if payload.startswith(b"\xff\xfe"):
        return payload[2:].decode("utf-16-le", errors="replace")
    if payload.startswith(b"\xfe\xff"):
        return payload[2:].decode("utf-16-be", errors="replace")
    try:
        return payload.decode("utf-8")
    except UnicodeDecodeError:
        return payload.decode("cp1252", errors="replace")


def _clean(lines: list[str]) -> str:
    text = "\n".join(lines)
    return unescape(_TAG_RE.sub("", text)).strip()


def _ms(h, m, s, ms) -> int:
    return ((int(h or 0) * 60 + int(m)) * 60 + int(s)) * 1000 + int(ms)


def _blocks(src: str):
    block: list[str] = []
    for line in src.replace("\r\n", "\n").replace("\r", "\n").split("\n"):
        if line.strip():
            block.append(line)
        elif block:
            yield block
            block = []
    if block:
        yield block


def parse_srt(src: str) -> list[tuple[int, int, int, str]]:
    """(pos, start_ms, end_ms, text) per SRT cue block."""
    out: list[tuple[int, int, int, str]] = []
    for block in _blocks(src):
        ts_at = next((i for i, ln in enumerate(block[:2])
                      if _TS_SRT.search(ln)), None)
        if ts_at is None:
            continue
        m = _TS_SRT.search(block[ts_at])
        text = _clean(block[ts_at + 1:])
        if not text:
            continue
        g = m.groups()
        out.append((len(out), _ms(*g[:4]), _ms(*g[4:]), text))
    return out


def parse_vtt(src: str) -> list[tuple[int, int, int, str]]:
    """(pos, start_ms, end_ms, text) per WebVTT cue."""
    out: list[tuple[int, int, int, str]] = []
    first = True
    for block in _blocks(src):
        if first:
            first = False
            if block[0].lstrip("﻿").startswith("WEBVTT"):
                continue        # header (+ metadata lines) block
        if block[0].split(" ", 1)[0] in ("NOTE", "STYLE", "REGION"):
            continue
        ts_at = next((i for i, ln in enumerate(block[:2])
                      if _TS_VTT.search(ln)), None)
        if ts_at is None:
            continue
        m = _TS_VTT.search(block[ts_at])
        text = _clean(block[ts_at + 1:])
        if not text:
            continue
        g = m.groups()
        out.append((len(out), _ms(*g[:4]), _ms(*g[4:]), text))
    return out


_TTML_CLOCK_RE = re.compile(
    r"^(\d+):(\d{2}):(\d{2})(?:\.(\d+))?$")
_TTML_OFFSET_RE = re.compile(r"^(\d+)(?:\.(\d+))?(h|m|s|ms)$")


def _ttml_ms(expr: str | None) -> int | None:
    """TTML time expression -> exact integer ms (float-free):
    clock-time ``H+:MM:SS(.fff)`` (frame-based ``:FF`` forms are
    unsupported -> None) or offset-time ``N(.f)(h|m|s|ms)``."""
    if not expr:
        return None
    expr = expr.strip()
    m = _TTML_CLOCK_RE.match(expr)
    if m:
        h, mi, sec, frac = m.groups()
        ms = (int(h) * 3_600_000 + int(mi) * 60_000
              + int(sec) * 1000 + int(((frac or "") + "000")[:3]))
        return ms if ms < (1 << 62) else None
    m = _TTML_OFFSET_RE.match(expr)
    if not m:
        return None
    whole, frac, unit = m.groups()
    scale = {"h": 3_600_000, "m": 60_000, "s": 1000, "ms": 1}[unit]
    ms = int(whole) * scale
    if frac:
        # exact: fraction digits scaled without floats
        ms += int(frac) * scale // (10 ** len(frac))
    return ms if ms < (1 << 62) else None


def parse_ttml(src: str) -> list[tuple[int, int, int, str]]:
    """(pos, start_ms, end_ms, text) per TTML ``<p>`` cue — the
    broadcast/IMSC timed-text format (W3C TTML1 subset). ``end``
    comes from @end or @begin + @dur; cues without a resolvable
    begin AND end are dropped; ``<br/>`` becomes a newline and
    per-line whitespace collapses (the SRT/VTT _clean rule); nested
    spans keep their text; malformed XML yields no rows (F5)."""
    from xml.etree import ElementTree as ET
    try:
        root = ET.fromstring(src)
    except (ET.ParseError, ValueError, LookupError):
        return []
    if root.tag.split("}")[-1] != "tt":
        return []
    out: list[tuple[int, int, int, str]] = []
    for el in root.iter():
        if el.tag.split("}")[-1] != "p":
            continue
        begin = _ttml_ms(el.get("begin"))
        if begin is None:
            continue
        end = _ttml_ms(el.get("end"))
        if end is None:
            dur = _ttml_ms(el.get("dur"))
            if dur is None:
                continue
            end = begin + dur
        parts: list[str] = [el.text or ""]
        for child in el:
            if child.tag.split("}")[-1] == "br":
                parts.append("\n")
            elif child.text:
                parts.append(child.text)
            if child.tail:
                parts.append(child.tail)
        text = _clean("".join(parts).split("\n"))
        if not text:
            continue
        out.append((len(out), begin, end, text))
    return out


def parse_subtitles(payload) -> list[tuple[int, int, int, str]]:
    """Decode + detect + parse: (pos, start_ms, end_ms, text) rows.
    A ``WEBVTT`` magic -> VTT; an XML document with a ``tt`` root ->
    TTML; anything else -> SRT. Bytes without a parseable cue yield
    an empty list, never raise."""
    if isinstance(payload, (bytes, bytearray, memoryview)):
        src = _decode(bytes(payload))
    else:
        src = payload or ""
    head = src.lstrip("﻿")[:64].lstrip()
    if head.startswith("WEBVTT"):
        return parse_vtt(src)
    if head.startswith("<"):
        return parse_ttml(src.lstrip("﻿"))
    return parse_srt(src)
