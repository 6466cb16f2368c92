"""WebAssembly binary-module reader — pure Python, from scratch over
the published binary format (webassembly.github.io/spec/core/binary),
Spark-free.

.wasm assets are ubiquitous on the modern web; the engine's view is
INDEX-SHAPED, like ``zipx``/``parquetx``: the section directory
(id/name/size/item counts), the import table (module/field/kind),
and the export table (name/kind/index) — never an interpreter.
Custom sections surface by name (``custom:name``,
``custom:producers``, ``custom:sourceMappingURL`` are the discovery
channels: symbolication links a deployed module back to original
sources, the srcmapx move).

Unsigned LEB128 throughout (the varint sibling of sqlitex's
big-endian varints and srcmapx's base64 VLQs); a malformed section
ends the walk at its boundary — everything already parsed is kept,
corpus audits need to SEE truncation, not lose the file.
"""

from __future__ import annotations

_MAGIC = b"\x00asm"
_SECTIONS = {0: "custom", 1: "type", 2: "import", 3: "function",
             4: "table", 5: "memory", 6: "global", 7: "export",
             8: "start", 9: "element", 10: "code", 11: "data",
             12: "datacount"}
# sections whose content begins with a vector count
_VEC = {1, 2, 3, 4, 5, 6, 7, 9, 10, 11}
_KINDS = {0: "func", 1: "table", 2: "memory", 3: "global"}


def _uleb(b: bytes, off: int, limit: int) -> tuple[int, int]:
    """(value, next_off); raises ValueError on overrun/overlong."""
    v = shift = 0
    while True:
        if off >= limit or shift > 63:
            raise ValueError("uleb")
        c = b[off]
        v |= (c & 0x7F) << shift
        off += 1
        if not c & 0x80:
            return v, off
        shift += 7


def _name(b: bytes, off: int, limit: int) -> tuple[str, int]:
    n, off = _uleb(b, off, limit)
    if off + n > limit:
        raise ValueError("name")
    return b[off:off + n].decode("utf-8", "replace"), off + n


def _limits(b: bytes, off: int, limit: int) -> int:
    flag = b[off]
    _, off = _uleb(b, off + 1, limit)
    if flag & 1:
        _, off = _uleb(b, off, limit)
    return off


def parse_wasm(payload) -> dict:
    """payload -> {"version": int|None, "sections": [...],
    "imports": [...], "exports": [...]}; never raises; all empty
    for junk. Section row: (pos, sec_id, sec_name, size, n_items)
    — size is the declared content size, n_items the leading
    vector count (None for custom/start). Import row: (pos, module,
    field, kind); export row: (pos, name, kind, index)."""
    out: dict = {"version": None, "sections": [], "imports": [],
                 "exports": []}
    if not isinstance(payload, (bytes, bytearray)) or \
            len(payload) < 8 or payload[:4] != _MAGIC:
        return out
    b = bytes(payload)
    out["version"] = int.from_bytes(b[4:8], "little")
    off = 8
    while off < len(b):
        try:
            sec_id = b[off]
            size, body = _uleb(b, off + 1, len(b))
            end = body + size
            if sec_id not in _SECTIONS or end > len(b):
                break
            sec_name = _SECTIONS[sec_id]
            n_items = None
            p = body
            if sec_id == 0:
                cname, p = _name(b, p, end)
                sec_name = f"custom:{cname}"
            elif sec_id in _VEC or sec_id == 12:
                n_items, p = _uleb(b, p, end)
                if n_items > 0x7FFFFFFF:
                    # Int32-column clamp rule: a declared count
                    # past int32 is garbage — NULL, never crash
                    n_items = None
            out["sections"].append(
                (len(out["sections"]), sec_id, sec_name, size,
                 n_items))
            if sec_id == 2 and n_items is not None:
                try:
                    for _ in range(min(n_items, 10_000)):
                        mod, p = _name(b, p, end)
                        fld, p = _name(b, p, end)
                        kind = b[p]
                        p += 1
                        if kind == 0:       # func: typeidx
                            _, p = _uleb(b, p, end)
                        elif kind == 1:     # table: reftype+limits
                            p = _limits(b, p + 1, end)
                        elif kind == 2:     # memory: limits
                            p = _limits(b, p, end)
                        elif kind == 3:     # global: valtype+mut
                            p += 2
                        else:
                            raise ValueError("kind")
                        out["imports"].append(
                            (len(out["imports"]), mod, fld,
                             _KINDS[kind]))
                except (ValueError, IndexError):
                    pass
            elif sec_id == 7 and n_items is not None:
                try:
                    for _ in range(min(n_items, 10_000)):
                        nm, p = _name(b, p, end)
                        kind = b[p]
                        idx, p = _uleb(b, p + 1, end)
                        if kind not in _KINDS or idx >= 1 << 63:
                            raise ValueError("kind")
                        out["exports"].append(
                            (len(out["exports"]), nm, _KINDS[kind],
                             idx))
                except (ValueError, IndexError):
                    pass
            off = end
        except (ValueError, IndexError):
            break
    return out
