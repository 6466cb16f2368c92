"""Windows shortcut (.lnk) reader — pure Python over [MS-SHLLINK],
Spark-free.

The desktop-forensics artifact that rides zips/disk images in web
archives: header (76 bytes, magic 0x4C + the fixed LinkCLSID),
LinkFlags / FileAttributes decoded to names, the three FILETIMEs
through the shared integer civil-date math (``olepsx``), target
size / icon index / show command; then the optional structures in
spec order — LinkTargetIDList skipped by its own size, LinkInfo
mined for the local base path + common suffix (and the volume
label), and the five StringData members (name, relative path,
working dir, arguments, icon location) in the unicode-or-codepage
form the IsUnicode flag selects. Never raises; junk -> None.
"""

from __future__ import annotations

import struct

from .olepsx import _filetime_iso

_CLSID = bytes([0x01, 0x14, 0x02, 0x00, 0x00, 0x00, 0x00, 0x00,
                0xC0, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x46])

_FLAGS = ((0x01, "has_idlist"), (0x02, "has_linkinfo"),
          (0x04, "has_name"), (0x08, "has_relpath"),
          (0x10, "has_workdir"), (0x20, "has_args"),
          (0x40, "has_icon"), (0x80, "unicode"),
          (0x2000, "run_as_user"))
_ATTRS = ((0x01, "readonly"), (0x02, "hidden"), (0x04, "system"),
          (0x10, "directory"), (0x20, "archive"),
          (0x80, "normal"), (0x100, "temporary"))
_SHOW = {1: "normal", 3: "maximized", 7: "minimized"}


def parse_lnk(payload) -> dict | None:
    """lnk bytes -> {"flags", "attributes", "created", "accessed",
    "modified", "target_size", "icon_index", "show_cmd", "volume_label",
    "base_path", "common_suffix", "name", "rel_path", "workdir",
    "arguments", "icon_location"} or None for junk. Never raises."""
    if not isinstance(payload, (bytes, bytearray)) or \
            len(payload) < 76:
        return None
    b = bytes(payload)
    if b[:4] != b"\x4c\x00\x00\x00" or b[4:20] != _CLSID:
        return None
    try:
        flags, attrs = struct.unpack_from("<II", b, 20)
        ct, at, wt = struct.unpack_from("<QQQ", b, 28)
        # IconIndex is SIGNED per [MS-SHLLINK] (negative resource ids,
        # e.g. 0xFFFFFFFB = -5, are common in real .lnk files); read
        # as u32 it overflowed the source-side Int32 column (r6,
        # ADVICE r5)
        size, icon, show = struct.unpack_from("<Iii", b, 52)
        out: dict = {
            "flags": "|".join(n for bit, n in _FLAGS
                              if flags & bit),
            "attributes": "|".join(n for bit, n in _ATTRS
                                   if attrs & bit),
            "created": _filetime_iso(ct),
            "accessed": _filetime_iso(at),
            "modified": _filetime_iso(wt),
            "target_size": size, "icon_index": icon,
            "show_cmd": _SHOW.get(show, str(show)),
            "volume_label": None, "base_path": None,
            "common_suffix": None, "name": None,
            "rel_path": None, "workdir": None,
            "arguments": None, "icon_location": None,
        }
        off = 76
        if flags & 0x01:                   # LinkTargetIDList
            if off + 2 > len(b):
                return out
            (sz,) = struct.unpack_from("<H", b, off)
            off += 2 + sz
        if flags & 0x02 and off + 4 <= len(b):   # LinkInfo
            (lsz,) = struct.unpack_from("<I", b, off)
            if lsz >= 0x1C and off + lsz <= len(b):
                li = b[off:off + lsz]
                (_hsz, liflags, vol_off, base_off, _cns_off,
                 suffix_off) = struct.unpack_from("<IIIIII", li, 4)

                def cstr(o):
                    if not 0 < o < lsz:
                        return None
                    end = li.find(b"\x00", o)
                    if end < 0:
                        return None
                    return li[o:end].decode("cp1252", "replace")

                if liflags & 0x01:
                    out["base_path"] = cstr(base_off)
                    if 0 < vol_off < lsz - 16:
                        (lbl_off,) = struct.unpack_from(
                            "<I", li, vol_off + 12)
                        out["volume_label"] = cstr(
                            vol_off + lbl_off)
                out["common_suffix"] = cstr(suffix_off)
            off += lsz
        uni = bool(flags & 0x80)

        def string_data(off: int) -> tuple[str | None, int]:
            if off + 2 > len(b):
                return None, off
            (n,) = struct.unpack_from("<H", b, off)
            off += 2
            if uni:
                raw = b[off:off + n * 2]
                off += n * 2
                return raw.decode("utf-16-le", "replace"), off
            raw = b[off:off + n]
            off += n
            return raw.decode("cp1252", "replace"), off

        for bit, field in ((0x04, "name"), (0x08, "rel_path"),
                           (0x10, "workdir"), (0x20, "arguments"),
                           (0x40, "icon_location")):
            if flags & bit:
                out[field], off = string_data(off)
        return out
    except (struct.error, IndexError):
        return None


# --- encode half (fixtures) --------------------------------------------------

def build_lnk(target_size: int = 0, created: str | None = None,
              modified: str | None = None,
              attributes: int = 0x20, show: int = 1,
              base_path: str | None = None,
              volume_label: str | None = None,
              name: str | None = None,
              rel_path: str | None = None,
              workdir: str | None = None,
              arguments: str | None = None,
              unicode_strings: bool = True,
              with_idlist: bool = False) -> bytes:
    def ft(iso):
        if iso is None:
            return 0
        from .olepsx import build_property_set  # noqa: F401
        # reuse the encoder's civil math via a tiny local parse
        y, mo, rest = iso.split("-", 2)
        dd, tm = rest.split("T")
        hh, mm, ss = tm.rstrip("Z").split(":")
        y, mo, dd = int(y), int(mo), int(dd)
        yy = y - (1 if mo <= 2 else 0)
        era = yy // 400
        yoe = yy - era * 400
        mp = mo - 3 if mo >= 3 else mo + 9
        doy = (153 * mp + 2) // 5 + dd - 1
        doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
        days = era * 146097 + doe - 719468
        secs = days * 86400 + int(hh) * 3600 + int(mm) * 60 \
            + int(ss)
        return (secs + 11644473600) * 10_000_000

    flags = 0
    if with_idlist:
        flags |= 0x01
    if base_path:
        flags |= 0x02
    if name is not None:
        flags |= 0x04
    if rel_path is not None:
        flags |= 0x08
    if workdir is not None:
        flags |= 0x10
    if arguments is not None:
        flags |= 0x20
    if unicode_strings:
        flags |= 0x80
    out = bytearray(76)
    out[0:4] = b"\x4c\x00\x00\x00"
    out[4:20] = _CLSID
    struct.pack_into("<II", out, 20, flags, attributes)
    struct.pack_into("<QQQ", out, 28, ft(created), 0,
                     ft(modified))
    struct.pack_into("<IIi", out, 52, target_size, 0, show)
    blob = bytes(out)
    if with_idlist:
        idl = b"\x14\x00" + b"\x00" * 18 + b"\x00\x00"
        blob += struct.pack("<H", len(idl)) + idl
    if base_path:
        bp = base_path.encode("cp1252") + b"\x00"
        vl = (volume_label or "").encode("cp1252") + b"\x00"
        vol = struct.pack("<IIII", 16 + len(vl), 3, 0, 16) + vl
        hdr_sz = 28
        vol_off = hdr_sz
        base_off = vol_off + len(vol)
        suffix = b"\x00"
        suffix_off = base_off + len(bp)
        total = suffix_off + len(suffix)
        li = struct.pack("<IIIIIII", total, hdr_sz, 0x01,
                         vol_off, base_off, 0, suffix_off)
        li += vol + bp + suffix
        blob += li
    for val in (name, rel_path, workdir, arguments):
        if val is None:
            continue
        if unicode_strings:
            raw = val.encode("utf-16-le")
            blob += struct.pack("<H", len(val)) + raw
        else:
            raw = val.encode("cp1252")
            blob += struct.pack("<H", len(raw)) + raw
    return blob
