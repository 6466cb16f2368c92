"""ZIP central-directory reader — from scratch, pure Python,
Spark-free.

The container sibling of ``parquetx``: every OOXML / ODF / EPUB /
WACZ payload this engine ingests is a zip, and the central
directory at the END of the file is its layout manifest — member
names, methods, compressed/uncompressed sizes, CRCs, offsets —
readable without inflating anything (at 100 TB: ranged tail reads,
the parquet-footer pattern). The office sources use stdlib
``zipfile`` to EXTRACT; this module is the INDEX-ONLY auditor, and
the stdlib is its free oracle (tests pin infolist() parity — the
idnx-vs-stdlib-codec discipline).

Classic format subset (no ZIP64 — a member table > 4 GB or > 65535
entries returns None rather than lying):
- EOCD (``PK\\x05\\x06``) found by scanning back through the
  trailing comment window (up to 64 KB + 22);
- central headers (``PK\\x01\\x02``): method, DOS mod time ->
  ISO string, crc32 (hex), sizes, flag-bit-11 UTF-8 names (cp437
  otherwise — the spec's legacy default), per-entry offsets;
- entry count and directory size cross-checked against EOCD.
"""

from __future__ import annotations

import struct

_EOCD_SIG = b"PK\x05\x06"
_CEN_SIG = b"PK\x01\x02"

METHOD_NAMES = {0: "stored", 8: "deflated", 9: "deflate64",
                12: "bzip2", 14: "lzma", 93: "zstd", 95: "xz",
                99: "aes"}


def _dos_iso(dt: int, dd: int) -> str:
    return (f"{((dd >> 9) & 0x7F) + 1980:04d}-"
            f"{(dd >> 5) & 0x0F:02d}-{dd & 0x1F:02d}T"
            f"{(dt >> 11) & 0x1F:02d}:{(dt >> 5) & 0x3F:02d}:"
            f"{(dt & 0x1F) * 2:02d}Z")


def parse_zip_directory(payload) -> dict | None:
    """Zip bytes -> {comment, entries: [...]} or None when no
    classic central directory is found. Never raises."""
    if payload is None:
        return None
    buf = bytes(payload)
    if len(buf) < 22:
        return None
    window = buf[-(65536 + 22):]
    pos = window.rfind(_EOCD_SIG)
    if pos < 0:
        return None
    eocd = window[pos:]
    if len(eocd) < 22:
        return None
    (n_disk, cd_start_disk, n_here, n_total, cd_size,
     cd_offset, comment_len) = struct.unpack_from("<HHHHIIH",
                                                  eocd, 4)
    if n_disk or cd_start_disk or n_here != n_total:
        return None                     # multi-disk: not classic
    if n_total == 0xFFFF or cd_offset == 0xFFFFFFFF:
        return None                     # ZIP64 markers
    if cd_offset + cd_size > len(buf):
        return None
    comment = eocd[22:22 + comment_len].decode("cp437", "replace")
    entries = []
    off = cd_offset
    end = cd_offset + cd_size
    while off + 46 <= end and len(entries) < n_total:
        if buf[off:off + 4] != _CEN_SIG:
            return None
        (ver_made, ver_need, flags, method, dt, dd, crc, csize,
         usize, name_len, extra_len, comment_len2, disk_no,
         int_attrs, ext_attrs, local_off) = struct.unpack_from(
            "<HHHHHHIIIHHHHHII", buf, off + 4)
        name_raw = buf[off + 46:off + 46 + name_len]
        if len(name_raw) < name_len:
            return None
        enc = "utf-8" if flags & 0x0800 else "cp437"
        entries.append({
            "pos": len(entries),
            "name": name_raw.decode(enc, "replace"),
            "method": METHOD_NAMES.get(method, str(method)),
            "mtime": _dos_iso(dt, dd),
            "crc32": f"{crc:08x}",
            "compressed_size": csize,
            "uncompressed_size": usize,
            "local_offset": local_off,
            "is_dir": name_raw.endswith(b"/"),
            "utf8_name": bool(flags & 0x0800),
        })
        off += 46 + name_len + extra_len + comment_len2
    if len(entries) != n_total:
        return None
    return {"comment": comment or None, "entries": entries}
