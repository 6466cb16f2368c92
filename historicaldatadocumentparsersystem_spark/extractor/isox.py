"""ISO 9660 disc-image reader — pure Python, from scratch over
ECMA-119, Spark-free.

Disc images ride mirror sites and firmware downloads; the engine's
view is the ``zipx`` one — volume descriptors (PVD + Joliet SVD
recognized by its UCS-2 escape sequences) and the directory tree
walked extent by extent into one member table with exact recorded
timestamps (the 7-byte offset form rendered as ISO text, no
timezone arithmetic). Both-endian fields are read little-endian
and cross-checked against the big half — a mismatch is the spec's
own corruption signal for that record.

Identifiers keep their ``;1`` version suffixes stripped; Joliet
names decode UCS-2BE. Depth capped; cycles guarded by visited
extents; a malformed record ends its directory, keeping parsed
members.
"""

from __future__ import annotations

_SECTOR = 2048


def _u32_both(b: bytes, off: int) -> int | None:
    le = int.from_bytes(b[off:off + 4], "little")
    be = int.from_bytes(b[off + 4:off + 8], "big")
    return le if le == be else None


def _u16_both(b: bytes, off: int) -> int | None:
    le = int.from_bytes(b[off:off + 2], "little")
    be = int.from_bytes(b[off + 2:off + 4], "big")
    return le if le == be else None


def _rec_date(b: bytes, off: int) -> str | None:
    y, mo, d, h, mi, s = b[off:off + 6]
    if mo < 1 or mo > 12 or d < 1 or d > 31 or h > 23 or mi > 59 \
            or s > 60 or y == 0 and mo == 0:
        return None
    return f"{1900 + y:04d}-{mo:02d}-{d:02d}T" \
           f"{h:02d}:{mi:02d}:{s:02d}"


def _clean_name(raw: bytes, joliet: bool) -> str | None:
    if raw == b"\x00":
        return "."
    if raw == b"\x01":
        return ".."
    name = raw.decode("utf-16-be" if joliet else "latin-1",
                      "replace")
    return name.split(";")[0] or None


def _walk_dir(b: bytes, lba: int, size: int, path: str,
              joliet: bool, depth: int, visited: set,
              out: list) -> None:
    if depth > 8 or lba in visited:
        return
    visited.add(lba)
    data = b[lba * _SECTOR: lba * _SECTOR + size]
    p = 0
    while p < len(data):
        ln = data[p] if p < len(data) else 0
        if ln == 0:
            # records never span sectors: skip to the next one
            nxt = (p // _SECTOR + 1) * _SECTOR
            if nxt <= p or nxt >= len(data):
                break
            p = nxt
            continue
        rec = data[p:p + ln]
        if len(rec) < 34:
            break
        ext = _u32_both(rec, 2)
        dsize = _u32_both(rec, 10)
        flags = rec[25]
        nlen = rec[32]
        if 33 + nlen > len(rec) or ext is None or dsize is None:
            break
        name = _clean_name(rec[33:33 + nlen], joliet)
        is_dir = bool(flags & 2)
        if name not in (None, ".", ".."):
            full = f"{path}/{name}" if path else name
            out.append((len(out), full, is_dir, dsize, ext,
                        _rec_date(rec, 18)))
            if is_dir and dsize <= 1 << 24:
                _walk_dir(b, ext, dsize, full, joliet, depth + 1,
                          visited, out)
        p += ln


def parse_iso(payload) -> dict:
    """payload -> {"volume_id", "system_id", "n_sectors",
    "block_size", "has_joliet", "members": [(pos, path, is_dir,
    size, lba, recorded)]}; never raises; volume_id None for
    junk. "ok" is True iff a PVD was found — the parse-success
    signal (a valid PVD may still have blank ids AND a clamped
    sector count, so header fields can all be NULL on a good
    parse). Members come from the Joliet tree when present (real
    names), else the PVD tree."""
    out: dict = {"ok": False, "volume_id": None, "system_id": None,
                 "n_sectors": None, "block_size": None,
                 "has_joliet": False, "members": []}
    if not isinstance(payload, (bytes, bytearray)) or \
            len(payload) < 17 * _SECTOR:
        return out
    b = bytes(payload)
    pvd = svd = None
    for i in range(16, min(32, len(b) // _SECTOR)):
        d = b[i * _SECTOR:(i + 1) * _SECTOR]
        if d[1:6] != b"CD001":
            break
        t = d[0]
        if t == 1 and pvd is None:
            pvd = d
        elif t == 2 and svd is None:
            # Joliet: UCS-2 escape sequences in the SVD
            if d[88:91] in (b"%/@", b"%/C", b"%/E"):
                svd = d
        elif t == 255:
            break
    if pvd is None:
        return out
    out["ok"] = True
    out["system_id"] = pvd[8:40].decode("latin-1").strip() or None
    out["volume_id"] = pvd[40:72].decode("latin-1").strip() or None
    ns = _u32_both(pvd, 80)
    # Int32-column clamp rule: u32 past int32 -> NULL
    out["n_sectors"] = ns if ns is None or ns <= 0x7FFFFFFF \
        else None
    out["block_size"] = _u16_both(pvd, 128)
    out["has_joliet"] = svd is not None
    src = svd if svd is not None else pvd
    root = src[156:156 + 34]
    ext = _u32_both(root, 2)
    size = _u32_both(root, 10)
    if ext is not None and size is not None and size <= 1 << 24:
        try:
            _walk_dir(b, ext, size, "", svd is not None, 0,
                      set(), out["members"])
        except (IndexError, ValueError):
            pass
    return out
