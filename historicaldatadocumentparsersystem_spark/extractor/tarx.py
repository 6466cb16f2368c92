"""tar (POSIX ustar) archive reader — pure Python, from scratch.

Bulk corpora ship as tarballs (arXiv source dumps are tars of .tex
files; Common Crawl mirrors tar their segments) — the archive member
of the loader family.  Built from scratch like warcx: fixed 512-byte
headers, octal fields, checksum validation, ustar name prefixes and
GNU long-name extension records.

Format shape:

- each member: one 512-byte header + ceil(size/512) data blocks;
  the archive ends at a zero block (or EOF — truncated archives
  degrade to the members already read, never raise)
- header fields (offset/len): name 0/100, size 124/12 (octal,
  NUL/space terminated), mtime 136/12, chksum 148/8 (unsigned sum of
  the header with the checksum field blanked), typeflag 156/1
  ('0'/NUL regular file, '5' directory, 'L' GNU long name carried as
  the data of a meta entry that renames the NEXT member), ustar
  magic 257/6, prefix 345/155 (joined to name with '/')
- a failed checksum ends the walk (junk after valid members is not
  trusted)

``extract_tar_text`` routes each regular member through
``core.extract_document`` (one level deep — nested tars are skipped,
not recursed) so a tarball of html/pdf/tex extracts like any other
container.  ``make_tar`` is the encode half (must itself decode).
"""

from __future__ import annotations

from dataclasses import dataclass

_BLOCK = 512


@dataclass
class TarMember:
    idx: int
    name: str
    size: int
    mtime: int      # epoch seconds
    typeflag: str   # '0' file, '5' dir, ...
    payload: bytes  # b'' for non-regular members


def is_tar(payload: bytes | None) -> bool:
    return bool(payload) and len(payload) >= _BLOCK \
        and payload[257:262] == b"ustar"


def _octal(field: bytes) -> int:
    s = field.split(b"\x00")[0].strip(b" \x00")
    if not s:
        return 0
    try:
        return int(s, 8)
    except ValueError:
        return 0


def _checksum_ok(header: bytes) -> bool:
    want = _octal(header[148:156])
    total = sum(header[:148]) + 8 * 0x20 + sum(header[156:])
    return total == want


def list_tar(payload: bytes | None) -> list[TarMember]:
    """Members in archive order; [] for junk, truncation degrades to
    the members already read (F5)."""
    if not is_tar(payload):
        return []
    out: list[TarMember] = []
    i, n = 0, len(payload)
    longname: str | None = None
    while i + _BLOCK <= n:
        header = payload[i:i + _BLOCK]
        if header == b"\x00" * _BLOCK:
            break
        if not _checksum_ok(header):
            break
        size = _octal(header[124:136])
        data = payload[i + _BLOCK:i + _BLOCK + size]
        typeflag = chr(header[156]) if header[156] else "0"
        i += _BLOCK + ((size + _BLOCK - 1) // _BLOCK) * _BLOCK
        if typeflag == "L":                  # GNU long name record
            longname = data.rstrip(b"\x00").decode(
                "utf-8", errors="replace")
            continue
        if longname is not None:
            name = longname
            longname = None
        else:
            name = header[:100].split(b"\x00")[0].decode(
                "utf-8", errors="replace")
            prefix = header[345:500].split(b"\x00")[0].decode(
                "utf-8", errors="replace")
            if prefix:
                name = f"{prefix}/{name}"
        out.append(TarMember(len(out), name, size,
                             _octal(header[136:148]), typeflag,
                             data if typeflag in ("0", "") else b""))
    return out


def extract_tar_text(payload: bytes | None
                     ) -> tuple[str, list[tuple[int, int, str]]]:
    """A1 form: each regular member extracted through the core
    dispatcher (one level — nested tars are skipped), blocks joined
    with "\\n", one span per non-empty member labeled by the member's
    doc kind."""
    from .core import extract_document
    parts: list[str] = []
    spans: list[tuple[int, int, str]] = []
    pos = 0
    for m in list_tar(payload):
        if m.typeflag not in ("0", "") or not m.payload \
                or is_tar(m.payload):
            continue
        res = extract_document(m.payload, None)
        text = res.extracted_text.strip()
        if not text:
            continue
        if parts:
            pos += 1
        spans.append((pos, pos + len(text), res.doc_kind))
        parts.append(text)
        pos += len(text)
    return "\n".join(parts), spans


# --- encode half (fixtures) ---------------------------------------------------

def _field(value: int, width: int) -> bytes:
    return f"{value:0{width - 1}o}".encode("ascii") + b"\x00"


def make_tar(members: list[dict]) -> bytes:
    """ustar archive.  ``members`` entries: ``{"name", "data"?: bytes,
    "mtime"?: int, "typeflag"?: '0'|'5', "gnu_longname"?: bool}``.
    Long names (> 100 chars, or forced) emit a GNU 'L' record like
    GNU tar does."""
    out = bytearray()

    def header(name: str, size: int, mtime: int, typeflag: str
               ) -> bytes:
        h = bytearray(_BLOCK)
        nb = name.encode("utf-8")
        h[0:len(nb[:100])] = nb[:100]
        h[100:108] = b"0000644\x00"
        h[108:116] = _field(0, 8)
        h[116:124] = _field(0, 8)
        h[124:136] = _field(size, 12)
        h[136:148] = _field(mtime, 12)
        h[148:156] = b" " * 8
        h[156] = ord(typeflag)
        h[257:263] = b"ustar\x00"
        h[263:265] = b"00"
        chk = sum(h)
        h[148:156] = f"{chk:06o}".encode("ascii") + b"\x00 "
        return bytes(h)

    for m in members:
        name = m["name"]
        data = m.get("data", b"")
        mtime = m.get("mtime", 0)
        typeflag = m.get("typeflag", "0")
        if len(name.encode("utf-8")) > 100 or m.get("gnu_longname"):
            nb = name.encode("utf-8") + b"\x00"
            out += header("././@LongLink", len(nb), 0, "L")
            out += nb + b"\x00" * ((-len(nb)) % _BLOCK)
            name = name[:100]
        out += header(name, len(data) if typeflag == "0" else 0,
                      mtime, typeflag)
        if typeflag == "0":
            out += data + b"\x00" * ((-len(data)) % _BLOCK)
    out += b"\x00" * (2 * _BLOCK)
    return bytes(out)
