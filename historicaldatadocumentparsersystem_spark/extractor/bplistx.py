"""Apple binary property list (bplist00) reader — pure Python, from
scratch over the published format (Apple CF source's
CFBinaryPList.c layout, widely documented), Spark-free.

The fourth binary-config dialect (after cborx / tomlx / msgpackx):
iOS/macOS app bundles, Safari exports, and mobile-API payloads ride
bplists. Same flattened-leaf row shape — one row per leaf with a
dotted/bracketed path, a type label, and a canonical text rendering.

Layout: "bplist00" magic; object table (marker-nibble typed values;
0xF low nibble -> following int object carries the count); offset
table (numObjects big-endian offsets of offsetIntSize bytes);
32-byte trailer (offsetIntSize, objectRefSize, numObjects,
topObject, offsetTableOffset). Containers hold object REFS, so the
walk is ref-indirected — cycle-guarded per path branch and
depth-capped. CFDate = double seconds since 2001-01-01; integral
in-range values render as ISO (pure integer civil math), the rest
as the exact double repr.

stdlib ``plistlib`` reads this format too — it is the pytest parity
oracle (the tomlx-vs-tomllib discipline).
"""

from __future__ import annotations

import re
import struct

_BARE = re.compile(r"[A-Za-z0-9_-]+")
_MAGIC = b"bplist00"
_APPLE_EPOCH = 978307200  # 2001-01-01 in unix seconds


class _Err(ValueError):
    pass


def _civil_iso(secs: int) -> str:
    days, rem = divmod(secs, 86400)
    hh, rem = divmod(rem, 3600)
    mm, ss = divmod(rem, 60)
    z = days + 719468
    era = z // 146097
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    m = mp + 3 if mp < 10 else mp - 9
    if m <= 2:
        y += 1
    return (f"{y:04d}-{m:02d}-{d:02d}T{hh:02d}:{mm:02d}:"
            f"{ss:02d}Z")


def parse_bplist(payload) -> dict:
    """payload -> {"ok": bool, "rows": [(pos, path, vtype,
    value_text)]}; never raises; ok False for junk/corrupt."""
    out: dict = {"ok": False, "rows": []}
    if not isinstance(payload, (bytes, bytearray)) or \
            len(payload) < 40 or bytes(payload[:8]) != _MAGIC:
        return out
    b = bytes(payload)
    try:
        (off_sz, ref_sz, n_obj, top, table_off) = struct.unpack(
            ">6xBBQQQ", b[-32:])
        if not (1 <= off_sz <= 8 and 1 <= ref_sz <= 8
                and 0 < n_obj <= 100_000 and top < n_obj
                and table_off + n_obj * off_sz <= len(b) - 32):
            return out
        offsets = [int.from_bytes(
            b[table_off + i * off_sz:table_off + (i + 1) * off_sz],
            "big") for i in range(n_obj)]
    except struct.error:
        return out
    rows: list[tuple] = []

    def render_key(v) -> str:
        if isinstance(v, str):
            return v if _BARE.fullmatch(v) else f'"{v}"'
        if isinstance(v, bytes):
            return f"h'{v.hex()}'"
        return str(v)

    def emit(path: str, vtype: str, text: str) -> None:
        rows.append((len(rows), path, vtype, text))

    def intat(off: int) -> tuple[int, int]:
        """int object at off -> (value, next_off)."""
        m = b[off]
        if m >> 4 != 1:
            raise _Err("count not int")
        n = 1 << (m & 0xF)
        if n > 16 or off + 1 + n > len(b):
            raise _Err("int overrun")
        return int.from_bytes(b[off + 1:off + 1 + n], "big"), \
            off + 1 + n

    def count_of(off: int) -> tuple[int, int]:
        m = b[off] & 0xF
        if m != 0xF:
            return m, off + 1
        return intat(off + 1)

    def refat(off: int) -> int:
        if off + ref_sz > len(b):
            raise _Err("ref overrun")
        return int.from_bytes(b[off:off + ref_sz], "big")

    def obj(idx: int, path: str, depth: int,
            seen: frozenset) -> object:
        if depth > 16 or idx >= n_obj or idx in seen:
            raise _Err("depth/cycle/ref")
        off = offsets[idx]
        if off >= len(b) - 32:
            raise _Err("offset overrun")
        m = b[off]
        t, low = m >> 4, m & 0xF
        if t == 0:
            if low == 0:
                emit(path, "null", "")
                return None
            if low in (8, 9):
                v = low == 9
                emit(path, "bool", "true" if v else "false")
                return v
            raise _Err("bad simple")
        if t == 1:
            n = 1 << low
            if n > 16 or off + 1 + n > len(b):
                raise _Err("int overrun")
            v = int.from_bytes(b[off + 1:off + 1 + n], "big",
                               signed=(n == 8))
            emit(path, "int", str(v))
            return v
        if t == 2:
            n = 1 << low
            if n not in (4, 8) or off + 1 + n > len(b):
                raise _Err("real size")
            v = struct.unpack(">f" if n == 4 else ">d",
                              b[off + 1:off + 1 + n])[0]
            emit(path, "real", repr(v))
            return v
        if t == 3:
            if low != 3 or off + 9 > len(b):
                raise _Err("date size")
            (sec,) = struct.unpack(">d", b[off + 1:off + 9])
            if sec == int(sec) and \
                    0 <= int(sec) + _APPLE_EPOCH < 4102444800:
                txt = _civil_iso(int(sec) + _APPLE_EPOCH)
            else:
                txt = repr(sec)
            emit(path, "date", txt)
            return sec
        if t in (4, 5, 6):
            n, doff = count_of(off)
            if t == 6:
                end = doff + n * 2
            else:
                end = doff + n
            if end > len(b) - 32 + 32 or end > len(b):
                raise _Err("data overrun")
            raw = b[doff:end]
            if t == 4:
                txt = f"h'{raw.hex()}'" if n <= 16 \
                    else f"bytes:{n}"
                emit(path, "data", txt)
                return raw
            if t == 5:
                s = raw.decode("ascii")
                emit(path, "str", s)
                return s
            s = raw.decode("utf-16-be")
            emit(path, "str", s)
            return s
        if t == 8:                          # UID
            n = low + 1
            if off + 1 + n > len(b):
                raise _Err("uid overrun")
            v = int.from_bytes(b[off + 1:off + 1 + n], "big")
            emit(path, "uid", str(v))
            return v
        if t in (0xA, 0xC):                 # array / set
            n, doff = count_of(off)
            if n > 10_000:
                raise _Err("array too long")
            label = "array" if t == 0xA else "set"
            for i in range(n):
                r = refat(doff + i * ref_sz)
                obj(r, f"{path}[{i}]", depth + 1,
                    seen | {idx})
            if n == 0:
                emit(path, label, "")
            return None
        if t == 0xD:                        # dict
            n, doff = count_of(off)
            if n > 10_000:
                raise _Err("dict too long")
            for i in range(n):
                kr = refat(doff + i * ref_sz)
                vr = refat(doff + (n + i) * ref_sz)
                key_rows = len(rows)
                kv = obj(kr, f"{path}<key{i}>", depth + 1,
                         seen | {idx})
                del rows[key_rows:]
                kk = render_key(kv) if kv is not None \
                    else f"<key{i}>"
                child = f"{path}.{kk}" if path else kk
                obj(vr, child, depth + 1, seen | {idx})
            if n == 0:
                emit(path, "dict", "")
            return None
        raise _Err("unknown marker")

    try:
        obj(top, "", 0, frozenset())
    except (_Err, ValueError, UnicodeDecodeError, struct.error,
            RecursionError):
        return out
    out["ok"] = True
    out["rows"] = rows
    return out
