"""Avro object-container reader — pure Python, from scratch over the
published spec (avro.apache.org/docs/current/specification),
Spark-free.

The row-oriented sibling of ``parquetx`` (column footers) and
``zipx`` (archives): data lakes are full of Avro landing files, and
the engine's view is INDEX-SHAPED — the header metadata map
(``avro.schema`` parsed to a shape summary, ``avro.codec``), the
16-byte sync marker discipline, and one row per data block
(record count, on-disk size, and the REAL inflated size for
``deflate`` blocks — raw zlib is stdlib). Record values are never
decoded.

Varints are zigzag longs (the third varint dialect in the repo,
after sqlitex's big-endian and wasmx's LEB128). A block whose
trailing sync marker mismatches ends the walk — that is the spec's
own corruption signal — keeping every verified block.
"""

from __future__ import annotations

import json
import zlib

from .compx import _count_stream

_MAGIC = b"Obj\x01"


def _zigzag(b: bytes, off: int) -> tuple[int, int]:
    """Avro long: little-endian base-128 varint, zigzag-decoded."""
    v = shift = 0
    while True:
        if off >= len(b) or shift > 63:
            raise ValueError("varint")
        c = b[off]
        v |= (c & 0x7F) << shift
        off += 1
        if not c & 0x80:
            r = (v >> 1) ^ -(v & 1)
            if not -(1 << 63) <= r < 1 << 63:
                raise ValueError("varint range")  # Int64 clamp
            return r, off
        shift += 7


def _bytes_val(b: bytes, off: int) -> tuple[bytes, int]:
    n, off = _zigzag(b, off)
    if n < 0 or off + n > len(b):
        raise ValueError("bytes")
    return b[off:off + n], off + n


def _schema_shape(schema) -> tuple:
    """parsed avro.schema JSON -> (stype, name, fields) where
    fields is [(name, type_label)]; non-record schemas get no
    fields. Type labels: primitives verbatim, records/enums/fixed
    by name, unions joined with '|', arrays/maps as 'array<..>'.
    Nesting labels stop at depth 6 (protox's cap) so a deeply
    nested schema cannot recurse unboundedly."""
    def label(t, depth: int = 0) -> str:
        if depth > 6:
            return "?"
        if isinstance(t, str):
            return t
        if isinstance(t, list):
            return "|".join(label(x, depth + 1) for x in t)
        if isinstance(t, dict):
            tt = t.get("type")
            if tt == "array":
                return f"array<{label(t.get('items'), depth + 1)}>"
            if tt == "map":
                return f"map<{label(t.get('values'), depth + 1)}>"
            nm = t.get("name")
            return nm if isinstance(nm, str) else str(tt)
        return "?"

    if isinstance(schema, dict) and schema.get("type") == "record":
        name = schema.get("name")
        fields = []
        for f in schema.get("fields", []):
            if isinstance(f, dict) and isinstance(
                    f.get("name"), str):
                fields.append((f["name"], label(f.get("type"))))
        return ("record", name if isinstance(name, str) else None,
                fields)
    return (label(schema), None, [])


def parse_avro(payload) -> dict:
    """payload -> {"codec", "schema_type", "schema_name",
    "fields": [(pos, name, type)], "blocks": [(pos, n_records,
    size, raw_size)], "sync_ok": bool|None}; never raises; codec
    None for junk. sync_ok False when a block's trailing marker
    mismatched (walk stopped there)."""
    out: dict = {"codec": None, "schema_type": None,
                 "schema_name": None, "fields": [], "blocks": [],
                 "sync_ok": None}
    if not isinstance(payload, (bytes, bytearray)) or \
            len(payload) < 4 or payload[:4] != _MAGIC:
        return out
    b = bytes(payload)
    try:
        off = 4
        meta: dict[str, bytes] = {}
        while True:
            cnt, off = _zigzag(b, off)
            if cnt == 0:
                break
            if cnt < 0:  # negative count: abs count + byte size
                cnt = -cnt
                _, off = _zigzag(b, off)
            for _ in range(min(cnt, 1000)):
                k, off = _bytes_val(b, off)
                v, off = _bytes_val(b, off)
                meta[k.decode("utf-8", "replace")] = v
        sync = b[off:off + 16]
        if len(sync) < 16:
            return out
        off += 16
    except ValueError:
        return out
    out["codec"] = meta.get("avro.codec", b"null").decode(
        "ascii", "replace")
    if "avro.schema" in meta:
        try:
            st, name, fields = _schema_shape(
                json.loads(meta["avro.schema"].decode(
                    "utf-8", "replace")))
            out["schema_type"] = st
            out["schema_name"] = name
            out["fields"] = [(i,) + f for i, f in
                             enumerate(fields)]
        except (ValueError, RecursionError):
            pass
    out["sync_ok"] = True
    while off < len(b):
        try:
            n_rec, p = _zigzag(b, off)
            size, p = _zigzag(b, p)
            if n_rec < 0 or size < 0 or p + size + 16 > len(b):
                break
            data = b[p:p + size]
            if b[p + size:p + size + 16] != sync:
                out["sync_ok"] = False
                break
            raw = size
            if out["codec"] == "deflate":
                # chunk-counted, never materialized: a deflate-bomb
                # block (~1030x expansion) must report its true size
                # in O(chunk) memory, not OOM the worker (compx's
                # bounded-decompression contract)
                try:
                    raw = _count_stream(
                        zlib.decompressobj(wbits=-15), data)
                except (zlib.error, MemoryError):
                    raw = None
            out["blocks"].append(
                (len(out["blocks"]), n_rec, size, raw))
            off = p + size + 16
        except ValueError:
            break
    return out
