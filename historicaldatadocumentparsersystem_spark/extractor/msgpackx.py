"""MessagePack item reader — pure Python, from scratch over the
published msgpack spec (github.com/msgpack/msgpack/blob/master/
spec.md), Spark-free.

The third member of the binary-config family after ``cborx`` (RFC
8949) and ``tomlx``: Redis/Fluentd/API payloads ride msgpack, and
the engine's view is the SAME flattened leaf shape — one row per
leaf with a dotted/bracketed path, a type label, and a canonical
text rendering — so CBOR, TOML, and msgpack configs are queryable
side by side.

Covered: all format-byte families (fixint both signs, fix/8/16/32
str, bin, array, map, nil/bool, uint/int 8-64, float 32/64), the
ext family with the spec's timestamp extension (type -1: 32-bit
seconds / fixext8 34+30-bit / ext8-12 96-bit) rendered as
``sec[.nanos]``; other ext types keep ``ext<type>:<len>``. A blob
must be EXACTLY one item with no trailing bytes (the protox/cborx
whole-buffer rule). 0xc1 is never-used per spec -> reject.
"""

from __future__ import annotations

import re
import struct

_BARE = re.compile(r"[A-Za-z0-9_-]+")


class _Err(ValueError):
    pass


def parse_msgpack(payload) -> dict:
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

    def emit(path: str, vtype: str, text: str) -> None:
        rows.append((len(rows), path, vtype, text))

    def take(off: int, n: int) -> int:
        if off + n > len(b):
            raise _Err("overrun")
        return off + n

    def ext_value(t: int, data: bytes, path: str) -> None:
        if t == 255 or t == -1:     # timestamp extension
            if len(data) == 4:
                sec, nano = struct.unpack(">I", data)[0], 0
            elif len(data) == 8:
                (v64,) = struct.unpack(">Q", data)
                nano, sec = v64 >> 34, v64 & ((1 << 34) - 1)
            elif len(data) == 12:
                nano, sec = struct.unpack(">Iq", data)
            else:
                raise _Err("bad timestamp len")
            if nano >= 1_000_000_000:
                raise _Err("bad nanos")
            txt = str(sec) + (f".{nano:09d}" if nano else "")
            emit(path, "timestamp", txt)
            return
        emit(path, f"ext{t if t < 128 else t - 256}",
             f"len:{len(data)}")

    def item(off: int, path: str, depth: int) -> tuple:
        if depth > 16:
            raise _Err("depth")
        if off >= len(b):
            raise _Err("overrun")
        c = b[off]
        off += 1
        if c <= 0x7F:                       # positive fixint
            emit(path, "int", str(c))
            return c, off
        if c >= 0xE0:                       # negative fixint
            v = c - 256
            emit(path, "int", str(v))
            return v, off
        if 0xA0 <= c <= 0xBF:               # fixstr
            n = c & 0x1F
            end = take(off, n)
            s = b[off:end].decode("utf-8")
            emit(path, "str", s)
            return s, end
        if 0x80 <= c <= 0x8F or c in (0xDE, 0xDF):   # map
            if c in (0xDE, 0xDF):
                w = 2 if c == 0xDE else 4
                end = take(off, w)
                n = int.from_bytes(b[off:end], "big")
                off = end
            else:
                n = c & 0x0F
            if n > 10_000:
                raise _Err("map too long")
            for k in range(n):
                key_rows = len(rows)
                kv, off = item(off, f"{path}<key{k}>", depth + 1)
                del rows[key_rows:]          # keys render into path
                kk = render_key(kv) if kv is not None \
                    else f"<key{k}>"
                child = f"{path}.{kk}" if path else kk
                _, off = item(off, child, depth + 1)
            if n == 0:
                emit(path, "map", "")
            return None, off
        if 0x90 <= c <= 0x9F or c in (0xDC, 0xDD):   # array
            if c in (0xDC, 0xDD):
                w = 2 if c == 0xDC else 4
                end = take(off, w)
                n = int.from_bytes(b[off:end], "big")
                off = end
            else:
                n = c & 0x0F
            if n > 10_000:
                raise _Err("array too long")
            for i in range(n):
                _, off = item(off, f"{path}[{i}]", depth + 1)
            if n == 0:
                emit(path, "array", "")
            return None, off
        if c == 0xC0:
            emit(path, "null", "")
            return None, off
        if c == 0xC1:
            raise _Err("0xc1 never used")
        if c in (0xC2, 0xC3):
            v = c == 0xC3
            emit(path, "bool", "true" if v else "false")
            return v, off
        if c in (0xC4, 0xC5, 0xC6):         # bin 8/16/32
            w = 1 << (c - 0xC4)
            end = take(off, w)
            n = int.from_bytes(b[off:end], "big")
            off = end
            end = take(off, n)
            raw = b[off:end]
            text = f"h'{raw.hex()}'" if n <= 16 else f"bytes:{n}"
            emit(path, "bin", text)
            return raw, end
        if c in (0xC7, 0xC8, 0xC9):         # ext 8/16/32
            w = 1 << (c - 0xC7)
            end = take(off, w)
            n = int.from_bytes(b[off:end], "big")
            off = take(end, 1)
            t = b[end]
            end = take(off, n)
            ext_value(t, b[off:end], path)
            return None, end
        if c == 0xCA:
            end = take(off, 4)
            v = struct.unpack(">f", b[off:end])[0]
            emit(path, "float", repr(v))
            return v, end
        if c == 0xCB:
            end = take(off, 8)
            v = struct.unpack(">d", b[off:end])[0]
            emit(path, "float", repr(v))
            return v, end
        if 0xCC <= c <= 0xCF:               # uint 8/16/32/64
            w = 1 << (c - 0xCC)
            end = take(off, w)
            v = int.from_bytes(b[off:end], "big")
            emit(path, "int", str(v))
            return v, end
        if 0xD0 <= c <= 0xD3:               # int 8/16/32/64
            w = 1 << (c - 0xD0)
            end = take(off, w)
            v = int.from_bytes(b[off:end], "big", signed=True)
            emit(path, "int", str(v))
            return v, end
        if 0xD4 <= c <= 0xD8:               # fixext 1/2/4/8/16
            n = 1 << (c - 0xD4)
            off2 = take(off, 1)
            t = b[off]
            end = take(off2, n)
            ext_value(t, b[off2:end], path)
            return None, end
        if 0xD9 <= c <= 0xDB:               # str 8/16/32
            w = 1 << (c - 0xD9)
            end = take(off, w)
            n = int.from_bytes(b[off:end], "big")
            off = end
            if n > 1 << 24:
                raise _Err("str too long")
            end = take(off, n)
            s = b[off:end].decode("utf-8")
            emit(path, "str", s)
            return s, end
        raise _Err("unknown byte")

    try:
        _, end = item(0, "", 0)
        if end != len(b):
            raise _Err("trailing bytes")
    except (_Err, ValueError, UnicodeDecodeError, struct.error,
            RecursionError):
        return out
    out["ok"] = True
    out["rows"] = rows
    return out


# --- encode half (fixtures) --------------------------------------------------

def encode_msgpack(v) -> bytes:
    """Canonical-ish encoder for fixture building: dict/list/str/
    bytes/int/float/bool/None plus ('__ts__', sec, nano) tuples for
    the timestamp extension."""
    if v is None:
        return b"\xc0"
    if isinstance(v, bool):
        return b"\xc3" if v else b"\xc2"
    if isinstance(v, int):
        if 0 <= v <= 0x7F:
            return bytes([v])
        if -32 <= v < 0:
            return bytes([v & 0xFF])
        if 0 <= v <= 0xFF:
            return b"\xcc" + bytes([v])
        if 0 <= v <= 0xFFFF:
            return b"\xcd" + v.to_bytes(2, "big")
        if 0 <= v <= 0xFFFFFFFF:
            return b"\xce" + v.to_bytes(4, "big")
        if v >= 0:
            return b"\xcf" + v.to_bytes(8, "big")
        if v >= -128:
            return b"\xd0" + v.to_bytes(1, "big", signed=True)
        if v >= -(1 << 31):
            return b"\xd2" + v.to_bytes(4, "big", signed=True)
        return b"\xd3" + v.to_bytes(8, "big", signed=True)
    if isinstance(v, float):
        return b"\xcb" + struct.pack(">d", v)
    if isinstance(v, str):
        raw = v.encode("utf-8")
        if len(raw) <= 31:
            return bytes([0xA0 | len(raw)]) + raw
        if len(raw) <= 0xFF:
            return b"\xd9" + bytes([len(raw)]) + raw
        return b"\xda" + len(raw).to_bytes(2, "big") + raw
    if isinstance(v, (bytes, bytearray)):
        raw = bytes(v)
        if len(raw) <= 0xFF:
            return b"\xc4" + bytes([len(raw)]) + raw
        return b"\xc5" + len(raw).to_bytes(2, "big") + raw
    if isinstance(v, tuple) and len(v) == 3 and v[0] == "__ts__":
        _m, sec, nano = v
        if nano == 0 and 0 <= sec <= 0xFFFFFFFF:
            return b"\xd6\xff" + struct.pack(">I", sec)
        if 0 <= sec < 1 << 34:
            return b"\xd7\xff" + struct.pack(
                ">Q", (nano << 34) | sec)
        return b"\xc7\x0c\xff" + struct.pack(">Iq", nano, sec)
    if isinstance(v, list):
        if len(v) <= 15:
            head = bytes([0x90 | len(v)])
        else:
            head = b"\xdc" + len(v).to_bytes(2, "big")
        return head + b"".join(encode_msgpack(x) for x in v)
    if isinstance(v, dict):
        if len(v) <= 15:
            head = bytes([0x80 | len(v)])
        else:
            head = b"\xde" + len(v).to_bytes(2, "big")
        return head + b"".join(
            encode_msgpack(k) + encode_msgpack(x)
            for k, x in v.items())
    raise TypeError(type(v))
