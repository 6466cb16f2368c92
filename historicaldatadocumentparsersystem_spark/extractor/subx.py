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


def parse_subtitles(payload) -> list[tuple[int, int, int, str]]:
    """Decode + detect + parse: (pos, start_ms, end_ms, text) rows.
    Bytes without a parseable cue yield an empty list, never raise."""
    if isinstance(payload, (bytes, bytearray, memoryview)):
        src = _decode(bytes(payload))
    else:
        src = payload or ""
    head = src.lstrip("﻿")[:32].lstrip()
    if head.startswith("WEBVTT"):
        return parse_vtt(src)
    return parse_srt(src)
