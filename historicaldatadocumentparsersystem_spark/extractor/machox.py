"""Mach-O executable reader — pure Python, from scratch over the
published Mach-O layout, Spark-free.

The Apple third of the executable triad (``elfx``, ``pex``):
dylibs/binaries inside crawled .app and .ipa archives get the
index-shaped view — magic (32/64-bit, both endians, and fat/
universal headers enumerating per-arch slices), cputype, filetype,
and the load-command walk that yields segment names with their
section counts plus LC_LOAD_DYLIB / LC_ID_DYLIB install names (the
otool -L surface).

Fat binaries recurse one level into each slice; a malformed load
command ends that slice's walk, keeping prior commands.
"""

from __future__ import annotations

_CPUS = {7: "x86", 0x01000007: "x86_64", 12: "arm",
         0x0100000C: "arm64", 18: "ppc", 0x01000012: "ppc64"}
_FILETYPES = {1: "object", 2: "execute", 4: "core", 6: "dylib",
              8: "bundle", 10: "dsym"}
_LC_SEG32, _LC_SEG64 = 0x01, 0x19
_LC_DYLIBS = {0x0C: "load", 0x0D: "id", 0x18: "weak",
              0x1F: "reexport"}


def _slice(b: bytes, arch: str | None, out: dict) -> None:
    if len(b) < 28:
        return
    magic = b[:4]
    if magic == b"\xfe\xed\xfa\xce":
        bo, is64 = "big", False
    elif magic == b"\xce\xfa\xed\xfe":
        bo, is64 = "little", False
    elif magic == b"\xfe\xed\xfa\xcf":
        bo, is64 = "big", True
    elif magic == b"\xcf\xfa\xed\xfe":
        bo, is64 = "little", True
    else:
        return

    def u32(o):
        return int.from_bytes(b[o:o + 4], bo)

    cpu = u32(4)
    ft = u32(12)
    ncmds = u32(16)
    out["slices"].append(
        (len(out["slices"]), arch,
         _CPUS.get(cpu, hex(cpu)), 64 if is64 else 32,
         "le" if bo == "little" else "be",
         _FILETYPES.get(ft, str(ft)), ncmds))
    sl = len(out["slices"]) - 1
    p = 32 if is64 else 28
    for _ in range(min(ncmds, 200)):
        if p + 8 > len(b):
            break
        cmd, csize = u32(p), u32(p + 4)
        if csize < 8 or p + csize > len(b):
            break
        if cmd in (_LC_SEG32, _LC_SEG64):
            nm = b[p + 8:p + 24].rstrip(b"\x00").decode(
                "latin-1")
            nsects = u32(p + (64 if cmd == _LC_SEG64 else 48))
            out["segments"].append(
                (len(out["segments"]), sl, nm,
                 # Int32-column clamp: raw u32 -> NULL past int32
                 nsects if nsects <= 0x7FFFFFFF else None))
        elif (cmd & 0x7FFFFFFF) in _LC_DYLIBS:
            off = u32(p + 8)
            if 8 <= off < csize:
                raw = b[p + off:p + csize]
                end = raw.find(b"\x00")
                name = raw[:end if end >= 0 else len(raw)] \
                    .decode("latin-1")
                if name:
                    out["dylibs"].append(
                        (len(out["dylibs"]), sl,
                         _LC_DYLIBS[cmd & 0x7FFFFFFF], name))
        p += csize


def parse_macho(payload) -> dict:
    """payload -> {"fat": bool|None, "slices": [(pos, arch, cpu,
    bits, endian, filetype, ncmds)], "segments": [(pos, slice,
    name, nsects)], "dylibs": [(pos, slice, link_kind, name)]};
    never raises; fat None for junk."""
    out: dict = {"fat": None, "slices": [], "segments": [],
                 "dylibs": []}
    if not isinstance(payload, (bytes, bytearray)) or \
            len(payload) < 8:
        return out
    b = bytes(payload)
    if b[:4] == b"\xca\xfe\xba\xbe":  # fat, big-endian header
        n = int.from_bytes(b[4:8], "big")
        if n > 16:  # Java class files share the magic; real fat
            return out  # headers have tiny arch counts
        out["fat"] = True
        for i in range(n):
            p = 8 + 20 * i
            if p + 20 > len(b):
                break
            cpu = int.from_bytes(b[p:p + 4], "big")
            off = int.from_bytes(b[p + 8:p + 12], "big")
            size = int.from_bytes(b[p + 12:p + 16], "big")
            if off + size > len(b):
                continue
            _slice(b[off:off + size],
                   _CPUS.get(cpu, hex(cpu)), out)
        return out
    before = len(out["slices"])
    _slice(b, None, out)
    if len(out["slices"]) > before:
        out["fat"] = False
    return out
