"""Unix ``ar`` archive + Debian package reader — pure Python, from
scratch over the classic ar layout, Spark-free.

Crawled mirrors are full of .deb packages and .a static libraries;
the engine's view is the ``zipx`` one — the member table (name/
mtime/mode/size, GNU ``//`` long-name table resolved) — plus the
.deb COMPOSITION: a .deb IS an ar archive (``debian-binary``,
``control.tar.*``, ``data.tar.*``), so the control member is
inflated through the stdlib codecs (gzip/xz — the ``compx``
dispatch), walked with the existing ``tarx`` member reader, and
the RFC-822-style control file parsed into fields and a split
Depends list (alternatives kept, version constraints separated) —
the apt-side dependency surface, mirroring elfx/pex/machox's
dynamic-link one.
"""

from __future__ import annotations

import lzma
import zlib

_CTRL_KEYS = ("Package", "Version", "Architecture", "Maintainer",
              "Section", "Priority", "Installed-Size", "Depends",
              "Description")


def _members(b: bytes) -> list[tuple]:
    """[(name, mtime, mode, size, payload)] — GNU '//' long names
    resolved, 'name/' trailing slashes stripped."""
    out: list[tuple] = []
    longnames = b""
    off = 8
    while off + 60 <= len(b):
        hdr = b[off:off + 60]
        if hdr[58:60] != b"`\n":
            break
        try:
            size = int(hdr[48:58].split()[0])
            mtime = int(hdr[16:28].split()[0] or 0)
            mode = hdr[40:48].split()
            mode_s = mode[0].decode("ascii") if mode else ""
        except (ValueError, IndexError):
            break
        if off + 60 + size > len(b):
            break
        data = b[off + 60:off + 60 + size]
        raw_name = hdr[:16].rstrip()
        name = raw_name.decode("latin-1")
        if name == "//":
            longnames = data
        else:
            if name.startswith("/") and name[1:].isdigit():
                p = int(name[1:])
                end = longnames.find(b"\n", p)
                name = longnames[p:end if end >= 0 else None] \
                    .decode("latin-1").rstrip("/")
            elif name != "/":
                name = name.rstrip("/")
            out.append((name, mtime, mode_s, size, data))
        off += 60 + size + (size & 1)
    return out


_MAX_CONTROL = 1 << 26  # 64 MB control.tar inflate cap


def _inflate(name: str, data: bytes) -> bytes | None:
    """Bounded: a lying .deb cannot bomb the worker — control
    archives are tiny, 64 MB is generous."""
    from .compx import inflate_bounded
    try:
        if name.endswith(".gz"):
            return inflate_bounded(data, 0, _MAX_CONTROL,
                                   wbits=31)[0]
        if name.endswith(".xz"):
            d = lzma.LZMADecompressor(format=lzma.FORMAT_XZ)
            out = bytearray(d.decompress(data, _MAX_CONTROL + 1))
            while not d.eof:
                if len(out) > _MAX_CONTROL:
                    return None
                chunk = d.decompress(
                    b"", _MAX_CONTROL + 1 - len(out))
                if not chunk and not d.eof:
                    return None
                out += chunk
            return bytes(out) if len(out) <= _MAX_CONTROL \
                else None
        if name.endswith(".tar"):
            return data
    except (zlib.error, lzma.LZMAError, ValueError):
        return None
    return None


def _parse_control(text: str) -> dict[str, str]:
    fields: dict[str, str] = {}
    key = None
    for line in text.split("\n"):
        if line[:1] in (" ", "\t") and key:
            fields[key] += "\n" + line.strip()
        elif ":" in line:
            key, _, val = line.partition(":")
            key = key.strip()
            fields[key] = val.strip()
        else:
            key = None
    return fields


def split_depends(value: str) -> list[tuple]:
    """Depends string -> [(group, alt, name, constraint)] — comma
    groups, '|' alternatives, '(>= 1.2)' constraints separated."""
    out: list[tuple] = []
    for g, group in enumerate(v.strip() for v in
                              value.split(",")):
        if not group:
            continue
        for a, alt in enumerate(x.strip() for x in
                                group.split("|")):
            if not alt:
                continue
            name, _, rest = alt.partition("(")
            constraint = rest.rstrip(")").strip() if rest else None
            # strip arch qualifiers like ':any'
            nm = name.strip().split(":")[0]
            if nm:
                out.append((g, a, nm, constraint))
    return out


def parse_ar(payload) -> dict:
    """payload -> {"kind": 'ar'|'deb'|None, "members": [(pos,
    name, mtime, mode, size)], "control": dict|None, "depends":
    [(group, alt, name, constraint)]}; never raises. kind 'deb'
    when a debian-binary member declares version 2.x and a
    control.tar.* member inflates + walks."""
    out: dict = {"kind": None, "members": [], "control": None,
                 "depends": []}
    if not isinstance(payload, (bytes, bytearray)) or \
            len(payload) < 8 or payload[:8] != b"!<arch>\n":
        return out
    b = bytes(payload)
    try:
        members = _members(b)
    except (ValueError, IndexError):
        return out
    if not members:
        return out
    out["kind"] = "ar"
    out["members"] = [(i, m[0], m[1], m[2], m[3])
                      for i, m in enumerate(members)]
    by_name = {m[0]: m[4] for m in members}
    dv = by_name.get("debian-binary")
    if dv is None or not dv.decode("ascii", "replace") \
            .strip().startswith("2."):
        return out
    ctrl_name = next((n for n in by_name
                      if n.startswith("control.tar")), None)
    if ctrl_name is None:
        return out
    tar = _inflate(ctrl_name, by_name[ctrl_name])
    if tar is None:
        return out
    from .tarx import list_tar
    for m in list_tar(tar):
        if m.name.lstrip("./") == "control" and m.payload:
            out["kind"] = "deb"
            fields = _parse_control(
                m.payload.decode("utf-8", "replace"))
            out["control"] = {k: fields[k] for k in _CTRL_KEYS
                              if k in fields}
            if "Depends" in fields:
                out["depends"] = split_depends(fields["Depends"])
            break
    return out
