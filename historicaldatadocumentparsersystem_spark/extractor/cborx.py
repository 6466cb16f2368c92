"""CBOR item reader — pure Python, from scratch over RFC 8949,
Spark-free.

CBOR rides WebAuthn attestations, COSE keys, and IoT payloads; the
engine's view mirrors ``tomlx``'s flattened key index — one row per
leaf with a dotted/bracketed path, a type label, and a canonical
text rendering — so binary configs and JSON-ish configs land in the
SAME queryable shape. Tags are transparent for nesting but recorded
on the type label (``int@tag1`` = epoch time), the COSE/date
information audits join on.

Covered: all major types, 8/16/32/64-bit arguments, indefinite-
length strings/arrays/maps (chunk types enforced), half/single/
double floats (half decoded via struct 'e'), simple values. A blob
must contain EXACTLY one item with no trailing bytes — ok False
otherwise (protox's whole-buffer rule).
"""

from __future__ import annotations

import struct

_BARE = __import__("re").compile(r"[A-Za-z0-9_-]+")


class _Err(ValueError):
    pass


def _arg(b: bytes, off: int, ai: int) -> tuple[int | None, int]:
    if ai < 24:
        return ai, off
    if ai == 31:
        return None, off  # indefinite marker
    if ai > 27:
        raise _Err("reserved ai")
    n = 1 << (ai - 24)
    if off + n > len(b):
        raise _Err("arg overrun")
    return int.from_bytes(b[off:off + n], "big"), off + n


def _float(b: bytes, off: int, ai: int) -> tuple[float, int]:
    if ai == 25:
        return struct.unpack(">e", b[off:off + 2])[0], off + 2
    if ai == 26:
        return struct.unpack(">f", b[off:off + 4])[0], off + 4
    return struct.unpack(">d", b[off:off + 8])[0], off + 8


def parse_cbor(payload) -> dict:
    """payload -> {"ok": bool, "rows": [(pos, path, vtype,
    value_text)]}; never raises; ok False (rows empty) unless the
    blob is exactly one well-formed item."""
    out: dict = {"ok": False, "rows": []}
    if not isinstance(payload, (bytes, bytearray)) or not payload:
        return out
    b = bytes(payload)
    rows: list[tuple] = []

    def render_key(v) -> str:
        if isinstance(v, str):
            return v if _BARE.fullmatch(v) else f'"{v}"'
        if isinstance(v, bytes):
            return f"h'{v.hex()}'"
        return str(v)

    def emit(path: str, vtype: str, text: str, tags: str) -> None:
        rows.append((len(rows), path,
                     vtype + tags, text))

    def item(off: int, path: str, depth: int,
             tags: str = "") -> tuple:
        """returns (python_value_for_keys, next_off); emits rows
        for leaves. python value is None for containers."""
        if depth > 16:
            raise _Err("depth")
        if off >= len(b):
            raise _Err("overrun")
        ib = b[off]
        mt, ai = ib >> 5, ib & 0x1F
        off += 1
        if mt in (0, 1):
            v, off = _arg(b, off, ai)
            if v is None:
                raise _Err("indefinite int")
            val = v if mt == 0 else -1 - v
            emit(path, "int", str(val), tags)
            return val, off
        if mt in (2, 3):
            n, off = _arg(b, off, ai)
            if n is None:  # indefinite: definite chunks of same mt
                parts = []
                while True:
                    if off >= len(b):
                        raise _Err("chunks overrun")
                    if b[off] == 0xFF:
                        off += 1
                        break
                    if b[off] >> 5 != mt or (b[off] & 0x1F) == 31:
                        raise _Err("bad chunk")
                    cn, o2 = _arg(b, off + 1, b[off] & 0x1F)
                    if o2 + cn > len(b):
                        raise _Err("chunk overrun")
                    parts.append(b[o2:o2 + cn])
                    off = o2 + cn
                raw = b"".join(parts)
            else:
                if off + n > len(b):
                    raise _Err("str overrun")
                raw = b[off:off + n]
                off += n
            if mt == 2:
                text = f"h'{raw.hex()}'" if len(raw) <= 16 \
                    else f"bytes:{len(raw)}"
                emit(path, "bstr", text, tags)
                return raw, off
            s = raw.decode("utf-8")  # strict per RFC
            emit(path, "tstr", s, tags)
            return s, off
        if mt == 4:
            n, off = _arg(b, off, ai)
            i = 0
            if n is None:
                while True:
                    if off >= len(b):
                        raise _Err("array overrun")
                    if b[off] == 0xFF:
                        off += 1
                        break
                    _, off = item(off, f"{path}[{i}]", depth + 1)
                    i += 1
            else:
                for i in range(min(n, 10_000)):
                    _, off = item(off, f"{path}[{i}]", depth + 1)
                if n >= 10_000:
                    raise _Err("array too long")
            if i == 0 and n in (0, None):
                emit(path, "array", "", tags)
            return None, off
        if mt == 5:
            n, off = _arg(b, off, ai)
            k = 0
            empty = True
            while True:
                if n is None:
                    if off >= len(b):
                        raise _Err("map overrun")
                    if b[off] == 0xFF:
                        off += 1
                        break
                elif k >= min(n, 10_000):
                    if n >= 10_000:
                        raise _Err("map too long")
                    break
                key_rows = len(rows)
                kv, off = item(off, f"{path}<key{k}>", depth + 1)
                del rows[key_rows:]  # keys render into the path
                kk = render_key(kv) if kv is not None \
                    else f"<key{k}>"
                child = f"{path}.{kk}" if path else kk
                _, off = item(off, child, depth + 1)
                empty = False
                k += 1
            if empty:
                emit(path, "map", "", tags)
            return None, off
        if mt == 6:
            t, off = _arg(b, off, ai)
            if t is None:
                raise _Err("indefinite tag")
            return item(off, path, depth + 1,
                        tags + f"@tag{t}")
        # mt == 7
        if ai == 20:
            emit(path, "bool", "false", tags)
            return False, off
        if ai == 21:
            emit(path, "bool", "true", tags)
            return True, off
        if ai == 22:
            emit(path, "null", "", tags)
            return None, off
        if ai == 23:
            emit(path, "undefined", "", tags)
            return None, off
        if ai in (25, 26, 27):
            if off + (1 << (ai - 24)) > len(b):
                raise _Err("float overrun")
            v, off = _float(b, off, ai)
            emit(path, "float", repr(v), tags)
            return v, off
        if ai < 20:
            emit(path, "simple", str(ai), tags)
            return None, off
        if ai == 24:
            if off >= len(b) or b[off] < 32:
                raise _Err("bad simple")
            emit(path, "simple", str(b[off]), tags)
            return None, off + 1
        raise _Err("bad mt7")

    try:
        _, end = item(0, "", 0)
        if end != len(b):
            raise _Err("trailing bytes")
    except (_Err, ValueError, UnicodeDecodeError, struct.error):
        return out
    out["ok"] = True
    out["rows"] = rows
    return out
