"""JS source map (Source Map v3) reader — pure Python, from
scratch, Spark-free.

``.map`` files sit next to every minified asset on the web; for a
code-corpus pipeline they recover the ORIGINAL file inventory
(sources, sourcesContent presence) and measure minification shape.
The interesting part is the ``mappings`` field: base64 VLQ
(variable-length quantity, continuation bit 32, sign in the LSB)
segment streams, decoded here by hand — both halves, encode for
fixtures and decode for reading, pinned against each other.

Deterministic subset:
- version must be 3 (anything else rejects the map);
- sources: one row per entry (kind of the llms.txt inventory),
  with has_content from sourcesContent alignment;
- mappings decode: segments are 1/4/5-field VLQ runs, fields 2-4
  RELATIVE to the previous segment (per spec); per-source segment
  counts aggregate the source-index field after cumulation;
- malformed VLQ (dangling continuation, junk chars) drops the
  REST of that line, keeping earlier lines (tolerant reader).
"""

from __future__ import annotations

import json

_B64 = ("ABCDEFGHIJKLMNOPQRSTUVWXYZ"
        "abcdefghijklmnopqrstuvwxyz0123456789+/")
_B64_IDX = {c: i for i, c in enumerate(_B64)}


def vlq_decode(s: str) -> list[int] | None:
    """Base64-VLQ string -> ints; None on malformed input."""
    out: list[int] = []
    acc = shift = 0
    for ch in s:
        v = _B64_IDX.get(ch)
        if v is None or shift > 30:
            return None
        acc |= (v & 31) << shift
        if v & 32:
            shift += 5
        else:
            out.append(-(acc >> 1) if acc & 1 else acc >> 1)
            acc = shift = 0
    return None if shift or acc else out


def vlq_encode(values: list[int]) -> str:
    """Encode half for fixtures (must round-trip)."""
    out = []
    for v in values:
        n = (-v << 1) | 1 if v < 0 else v << 1
        while True:
            digit = n & 31
            n >>= 5
            if n:
                out.append(_B64[digit | 32])
            else:
                out.append(_B64[digit])
                break
    return "".join(out)


def parse_sourcemap(payload) -> dict | None:
    """Source map bytes -> {file, source_root, sources: [(pos,
    source, has_content, n_segments)], n_names, n_lines,
    n_segments} or None for non-v3 payloads. Never raises."""
    if payload is None:
        return None
    if isinstance(payload, (bytes, bytearray)):
        try:
            payload = bytes(payload).decode("utf-8")
        except UnicodeDecodeError:
            return None
    try:
        doc = json.loads(payload)
    except Exception:
        return None
    if not isinstance(doc, dict) or doc.get("version") != 3:
        return None
    sources = [s if isinstance(s, str) else None
               for s in (doc.get("sources")
                         if isinstance(doc.get("sources"), list)
                         else [])]
    content = (doc.get("sourcesContent")
               if isinstance(doc.get("sourcesContent"), list)
               else [])
    names = (doc.get("names")
             if isinstance(doc.get("names"), list) else [])
    mappings = (doc.get("mappings")
                if isinstance(doc.get("mappings"), str) else "")
    per_source = [0] * len(sources)
    n_lines = n_segments = 0
    src_idx = 0                     # fields are stream-relative
    for line in mappings.split(";"):
        n_lines += 1
        for seg in line.split(","):
            if not seg:
                continue
            vals = vlq_decode(seg)
            if vals is None or len(vals) not in (1, 4, 5):
                break               # drop the rest of this line
            n_segments += 1
            if len(vals) >= 4:
                src_idx += vals[1]
                if 0 <= src_idx < len(per_source):
                    per_source[src_idx] += 1
    return {
        "file": doc.get("file")
        if isinstance(doc.get("file"), str) else None,
        "source_root": doc.get("sourceRoot")
        if isinstance(doc.get("sourceRoot"), str) else None,
        "sources": [
            (i, s,
             i < len(content) and isinstance(content[i], str),
             per_source[i])
            for i, s in enumerate(sources)],
        "n_names": len(names),
        "n_lines": n_lines,
        "n_segments": n_segments,
    }


def build_sourcemap(*, file: str, sources: list[str],
                    names: list[str],
                    lines: list[list[list[int]]],
                    source_root: str = None,
                    content_for: set = frozenset()) -> bytes:
    """Encode half: lines is [[segment-values, ...], ...] with
    ABSOLUTE source/line/col values per segment; relativization
    (the spec's delta encoding) happens here."""
    prev = [0, 0, 0, 0]  # src, oline, ocol, name (col resets/line)
    enc_lines = []
    for segs in lines:
        col = 0
        enc = []
        for seg in segs:
            vals = [seg[0] - col]
            col = seg[0]
            for k in range(1, len(seg)):
                vals.append(seg[k] - prev[k - 1])
                prev[k - 1] = seg[k]
            enc.append(vlq_encode(vals))
        enc_lines.append(",".join(enc))
    doc = {"version": 3, "file": file, "sources": sources,
           "names": names, "mappings": ";".join(enc_lines)}
    if source_root is not None:
        doc["sourceRoot"] = source_root
    if content_for:
        doc["sourcesContent"] = [
            f"// content of {s}" if i in content_for else None
            for i, s in enumerate(sources)]
    return json.dumps(doc, sort_keys=True).encode("utf-8")
