"""Schema-free protobuf wire-format census — pure Python, from
scratch over the published encoding (protobuf.dev/programming-guides/
encoding), Spark-free.

Crawled APIs and mobile backends ship protobuf blobs whose .proto
files are long gone; the protoscope-style move is a SCHEMA-FREE
field census: walk tag varints (field number + wire type), size
every field, and classify each length-delimited value by a
deterministic heuristic — a valid sub-message that consumes its
bytes exactly is 'msg' (recursed into, fields reported under a
dotted path), else valid UTF-8 with no C0 controls is 'str', else
'bytes'. The census aggregates per (path, field_no, wire_type,
kind) — the shape a reverse-engineering pipeline joins on.

Wire types: 0 varint, 1 fixed64, 5 fixed32, 2 length-delimited;
the deprecated group markers (3/4) make a buffer non-protobuf, as
do unknown types — ``ok`` is the parse verdict for the whole blob.
Depth capped at 6; recursion never reclassifies the parent.
"""

from __future__ import annotations

_WIRE = {0: "varint", 1: "i64", 2: "len", 5: "i32"}
_MAX_DEPTH = 6


def _varint(b: bytes, off: int) -> tuple[int, int]:
    v = shift = 0
    while True:
        if off >= len(b) or shift > 63:
            raise ValueError("varint")
        c = b[off]
        v |= (c & 0x7F) << shift
        off += 1
        if not c & 0x80:
            return v, off
        shift += 7


def _walk(b: bytes, depth: int):
    """yield (field_no, wire_type, value_bytes) or raise
    ValueError if b is not a clean message."""
    off = 0
    found = False
    while off < len(b):
        tag, off = _varint(b, off)
        fno, wt = tag >> 3, tag & 7
        if fno == 0 or wt not in _WIRE:
            raise ValueError("tag")
        if wt == 0:
            start = off
            _, off = _varint(b, off)
            val = b[start:off]
        elif wt == 1:
            if off + 8 > len(b):
                raise ValueError("i64")
            val = b[off:off + 8]
            off += 8
        elif wt == 5:
            if off + 4 > len(b):
                raise ValueError("i32")
            val = b[off:off + 4]
            off += 4
        else:
            n, off = _varint(b, off)
            if n < 0 or off + n > len(b):
                raise ValueError("len")
            val = b[off:off + n]
            off += n
        found = True
        yield fno, wt, val
    if not found:
        raise ValueError("empty")


def _classify_len(val: bytes, depth: int) -> str:
    if val and depth < _MAX_DEPTH:
        try:
            list(_walk(val, depth + 1))
            return "msg"
        except ValueError:
            pass
    try:
        s = val.decode("utf-8")
        if all(c >= " " or c in "\t\n\r" for c in s):
            return "str"
    except UnicodeDecodeError:
        pass
    return "bytes"


def parse_protobuf(payload) -> dict:
    """payload -> {"ok": bool, "fields": [...]}; never raises.
    Field row: (path, field_no, wire_type, kind, n, bytes_total)
    sorted by (path, field_no, kind) — path is the dotted field
    trail ('' at top level), bytes_total counts value bytes
    (headers excluded). ok False => fields empty."""
    out: dict = {"ok": False, "fields": []}
    if not isinstance(payload, (bytes, bytearray)) or not payload:
        return out
    b = bytes(payload)
    agg: dict[tuple, list] = {}

    def visit(buf: bytes, path: str, depth: int) -> None:
        for fno, wt, val in _walk(buf, depth):
            kind = _WIRE[wt]
            if wt == 2:
                kind = _classify_len(val, depth)
            key = (path, fno, _WIRE[wt], kind)
            slot = agg.setdefault(key, [0, 0])
            slot[0] += 1
            slot[1] += len(val)
            if kind == "msg":
                child = f"{path}.{fno}" if path else str(fno)
                visit(val, child, depth + 1)

    try:
        visit(b, "", 0)
    except ValueError:
        return out
    out["ok"] = True
    out["fields"] = [
        (path, fno, wt, kind, n, total)
        for (path, fno, wt, kind), (n, total) in sorted(
            agg.items(),
            key=lambda kv: (kv[0][0], kv[0][1], kv[0][3]))]
    return out
