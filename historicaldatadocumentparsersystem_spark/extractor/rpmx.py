"""RPM package reader — pure Python over the published rpm file
format (rpm.org "package format" docs / rpmlib header spec),
Spark-free.

The yum/dnf-side complement of ``arx``'s .deb branch: lead (96
bytes, magic ED AB EE DB), then TWO header sections (signature —
8-byte-aligned — and main), each an index of 16-byte entries
(tag, type, offset, count) over a data blob. The engine reads
package identity (name/version/release/arch/license/summary),
payload format/compressor, and the dependency surface
(REQUIRENAME/REQUIREVERSION and PROVIDENAME/PROVIDEVERSION pairs)
— the rows ``deb_dependency_census``-style package joins need.
The cpio payload itself is never unpacked (index-only discipline).

Store types covered: CHAR/INT8/16/32/64 (big-endian), STRING (NUL),
STRING_ARRAY, I18NSTRING (first locale). Never raises; junk ->
None. Counts/sizes bounds-clamped.
"""

from __future__ import annotations

import struct

_LEAD_MAGIC = b"\xed\xab\xee\xdb"
_HDR_MAGIC = b"\x8e\xad\xe8\x01"

_TAGS = {
    1000: "name", 1001: "version", 1002: "release",
    1004: "summary", 1014: "license", 1016: "group",
    1022: "arch", 1124: "payload_format",
    1125: "payload_compressor",
}
_REQ_NAME, _REQ_VER = 1049, 1050
_PROV_NAME, _PROV_VER = 1047, 1113


def _read_header(b: bytes, off: int
                 ) -> tuple[dict[int, object], int] | None:
    """header section at off -> (tag -> value, next_off)."""
    if off + 16 > len(b) or b[off:off + 4] != _HDR_MAGIC:
        return None
    nindex, hsize = struct.unpack_from(">II", b, off + 8)
    if not 0 < nindex <= 10_000 or hsize > len(b):
        return None
    idx_off = off + 16
    data_off = idx_off + nindex * 16
    data_end = data_off + hsize
    if data_end > len(b):
        return None
    out: dict[int, object] = {}
    for i in range(nindex):
        tag, typ, doff, cnt = struct.unpack_from(
            ">IIII", b, idx_off + i * 16)
        if cnt > 100_000 or doff > hsize:
            continue
        p = data_off + doff
        try:
            if typ in (3, 4, 5):            # int16/32/64
                w = {3: 2, 4: 4, 5: 8}[typ]
                if p + w > data_end:
                    continue
                out[tag] = int.from_bytes(b[p:p + w], "big")
            elif typ in (0, 1, 2):          # null/char/int8
                if p < data_end:
                    out[tag] = b[p]
            elif typ in (6, 9):             # string / i18n first
                end = b.find(b"\x00", p, data_end)
                if end < 0:
                    continue
                out[tag] = b[p:end].decode("utf-8", "replace")
            elif typ == 8:                  # string array
                vals = []
                q = p
                for _ in range(min(cnt, 10_000)):
                    end = b.find(b"\x00", q, data_end)
                    if end < 0:
                        break
                    vals.append(b[q:end].decode("utf-8",
                                                "replace"))
                    q = end + 1
                out[tag] = vals
        except (struct.error, IndexError):
            continue
    return out, data_end


def parse_rpm(payload) -> dict | None:
    """rpm bytes -> {"name", "version", "release", "arch",
    "license", "summary", "group", "payload_format",
    "payload_compressor", "requires": [(name, version_req)],
    "provides": [(name, version)]} or None for junk. Never
    raises."""
    if not isinstance(payload, (bytes, bytearray)) or \
            len(payload) < 96 + 32 or \
            bytes(payload[:4]) != _LEAD_MAGIC:
        return None
    b = bytes(payload)
    sig = _read_header(b, 96)
    if sig is None:
        return None
    _sig_tags, off = sig
    off = (off + 7) & ~7                    # signature pads to 8
    main = _read_header(b, off)
    if main is None:
        return None
    tags, _end = main
    out: dict = {name: None for name in _TAGS.values()}
    for tag, name in _TAGS.items():
        v = tags.get(tag)
        if isinstance(v, str):
            out[name] = v
    def pairs(nt, vt):
        names = tags.get(nt)
        vers = tags.get(vt)
        if not isinstance(names, list):
            return []
        if not isinstance(vers, list):
            vers = [""] * len(names)
        return [(n, vers[i] if i < len(vers) and vers[i] else None)
                for i, n in enumerate(names)]
    out["requires"] = pairs(_REQ_NAME, _REQ_VER)
    out["provides"] = pairs(_PROV_NAME, _PROV_VER)
    return out


# --- encode half (fixtures) --------------------------------------------------

def build_rpm_header(entries: list[tuple[int, int, object]]
                     ) -> bytes:
    """[(tag, type, value)] -> one header section (magic + index +
    data)."""
    index = b""
    data = b""
    for tag, typ, val in entries:
        doff = len(data)
        if typ == 4:
            # int32 aligns to 4 in real rpm
            pad = (-doff) % 4
            data += b"\x00" * pad
            doff += pad
            data += struct.pack(">I", int(val))
            cnt = 1
        elif typ in (6, 9):
            data += str(val).encode("utf-8") + b"\x00"
            cnt = 1
        elif typ == 8:
            for s in val:
                data += str(s).encode("utf-8") + b"\x00"
            cnt = len(val)
        else:
            raise ValueError(typ)
        index += struct.pack(">IIII", tag, typ, doff, cnt)
    return (_HDR_MAGIC + b"\x00" * 4
            + struct.pack(">II", len(entries), len(data))
            + index + data)


def build_rpm(name: str, version: str, release: str, arch: str,
              requires: list[tuple[str, str | None]] = (),
              provides: list[tuple[str, str | None]] = (),
              license_: str = "MIT",
              summary: str = "test package") -> bytes:
    # lead = magic(4) major/minor(2) type(2) archnum(2) name(66)
    # osnum(2) sig_type(2) reserved(16) = 96 bytes
    lead = (_LEAD_MAGIC + bytes([3, 0])
            + struct.pack(">HH", 0, 1)
            + name.encode()[:66].ljust(66, b"\x00")
            + struct.pack(">HH", 1, 5) + b"\x00" * 16)
    sig = build_rpm_header([(1000, 4, 0)])
    pad = (-len(sig)) % 8
    entries = [
        (1000, 6, name), (1001, 6, version), (1002, 6, release),
        (1004, 9, summary), (1014, 6, license_),
        (1016, 9, "Applications/Internet"), (1022, 6, arch),
        (1124, 6, "cpio"), (1125, 6, "zstd"),
    ]
    if requires:
        entries.append((_REQ_NAME, 8, [r[0] for r in requires]))
        entries.append((_REQ_VER, 8,
                        [r[1] or "" for r in requires]))
    if provides:
        entries.append((_PROV_NAME, 8, [p[0] for p in provides]))
        entries.append((_PROV_VER, 8,
                        [p[1] or "" for p in provides]))
    main = build_rpm_header(entries)
    return lead + sig + b"\x00" * pad + main \
        + b"\x28\xb5\x2f\xfd fake-zstd-payload"
