"""Web-font metadata reader — pure Python, from scratch over the
published sfnt (OpenType/TrueType) and WOFF specs, Spark-free.

Fonts are among the most-fetched subresources on the web (cssx
already mines their url() references; this is the fetch-side
complement): the engine's view is INDEX-SHAPED — the sfnt table
directory (tag/offset/length), and the ``name`` table's strings
(family/subfamily/full/version/postscript) decoded per the
platform/encoding rules (Windows UTF-16BE, Mac Roman≈latin-1).

Containers: raw sfnt (0x00010000 / 'OTTO' / 'true'), WOFF ('wOFF':
per-table zlib — stdlib — so the name table is decompressed and
parsed for real), and WOFF2 ('wOF2': Brotli is not in this
container, so the header fields are indexed and tables are left
unenumerated — the multimodal stub rule: plumbing real, decode
gated). Junk yields kind None; a malformed directory keeps what
parsed.
"""

from __future__ import annotations

import zlib

from .compx import inflate_bounded

_NAME_IDS = {0: "copyright", 1: "family", 2: "subfamily",
             3: "unique_id", 4: "full_name", 5: "version",
             6: "postscript", 8: "manufacturer", 11: "vendor_url",
             13: "license", 16: "typo_family", 17: "typo_subfamily"}


def _flavor(v: bytes) -> str | None:
    if v == b"\x00\x01\x00\x00":
        return "truetype"
    if v == b"OTTO":
        return "cff"
    if v == b"true":
        return "apple"
    return None


def _parse_names(tbl: bytes) -> list[tuple]:
    """name-table bytes -> [(pos, name_id, name_kind, platform,
    value)]."""
    out: list[tuple] = []
    if len(tbl) < 6:
        return out
    count = int.from_bytes(tbl[2:4], "big")
    str_off = int.from_bytes(tbl[4:6], "big")
    for i in range(min(count, 500)):
        p = 6 + 12 * i
        if p + 12 > len(tbl):
            break
        plat = int.from_bytes(tbl[p:p + 2], "big")
        enc = int.from_bytes(tbl[p + 2:p + 4], "big")
        nid = int.from_bytes(tbl[p + 6:p + 8], "big")
        ln = int.from_bytes(tbl[p + 8:p + 10], "big")
        off = int.from_bytes(tbl[p + 10:p + 12], "big")
        raw = tbl[str_off + off:str_off + off + ln]
        if len(raw) < ln:
            continue
        if plat == 1:
            value = raw.decode("latin-1", "replace")
        else:  # Windows (3) and Unicode (0) are UTF-16BE
            value = raw.decode("utf-16-be", "replace")
        out.append((len(out), nid,
                    _NAME_IDS.get(nid, str(nid)), plat, value))
    return out


def parse_font(payload) -> dict:
    """payload -> {"kind": 'sfnt'|'woff'|'woff2'|None, "flavor",
    "n_tables", "tables": [(pos, tag, offset, length,
    comp_length)], "names": [...]}; never raises; all None/empty
    for junk."""
    out: dict = {"kind": None, "flavor": None, "n_tables": None,
                 "tables": [], "names": []}
    if not isinstance(payload, (bytes, bytearray)) or \
            len(payload) < 12:
        return out
    b = bytes(payload)
    magic = b[:4]
    try:
        if magic == b"wOF2":
            out["kind"] = "woff2"
            out["flavor"] = _flavor(b[4:8])
            if len(b) >= 14:
                out["n_tables"] = int.from_bytes(b[12:14], "big")
            return out
        if magic == b"wOFF":
            if len(b) < 44:
                return out
            out["kind"] = "woff"
            out["flavor"] = _flavor(b[4:8])
            n = int.from_bytes(b[12:14], "big")
            out["n_tables"] = n
            for i in range(min(n, 200)):
                p = 44 + 20 * i
                if p + 20 > len(b):
                    break
                tag = b[p:p + 4].decode("latin-1")
                off = int.from_bytes(b[p + 4:p + 8], "big")
                comp = int.from_bytes(b[p + 8:p + 12], "big")
                orig = int.from_bytes(b[p + 12:p + 16], "big")
                out["tables"].append(
                    (len(out["tables"]), tag, off, orig, comp))
                if tag == "name" and off + comp <= len(b) \
                        and orig <= 1 << 26:
                    raw = b[off:off + comp]
                    if comp < orig:
                        try:
                            # bounded by the declared origLength —
                            # a lying header cannot bomb the worker
                            raw, _ = inflate_bounded(
                                raw, 0, orig)
                        except (zlib.error, ValueError):
                            continue
                    out["names"] = _parse_names(raw)
            return out
        fl = _flavor(magic)
        if fl is None:
            return out
        out["kind"] = "sfnt"
        out["flavor"] = fl
        n = int.from_bytes(b[4:6], "big")
        out["n_tables"] = n
        for i in range(min(n, 200)):
            p = 12 + 16 * i
            if p + 16 > len(b):
                break
            tag = b[p:p + 4].decode("latin-1")
            off = int.from_bytes(b[p + 8:p + 12], "big")
            ln = int.from_bytes(b[p + 12:p + 16], "big")
            out["tables"].append(
                (len(out["tables"]), tag, off, ln, None))
            if tag == "name" and off + ln <= len(b):
                out["names"] = _parse_names(b[off:off + ln])
        return out
    except (ValueError, IndexError):
        return out
