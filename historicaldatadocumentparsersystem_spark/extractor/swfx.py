"""SWF (Flash) header + tag-census reader — pure Python over the
published SWF File Format Specification (v19), Spark-free.

Two decades of the archived web is .swf; the index view is the
header (version, declared size, stage RECT in twips -> pixel
dims, frame rate/count) and a tag census (code -> count/bytes) —
ActionScript is never executed, bitmaps never decoded.

- ``FWS`` = uncompressed; ``CWS`` = zlib body (inflated BOUNDED by
  the header's own declared uncompressed length — the compx
  contract); ``ZWS`` = LZMA body (header-indexed only, like
  WOFF2's Brotli gate: version/size parsed, no body walk).
- The stage RECT is bit-packed: 5-bit nbits then four signed
  nbits fields (twips; 20 twips = 1 px).
- Tags: u16le code<<6|len, 0x3F escapes to u32le long length.
"""

from __future__ import annotations

import struct
import zlib

from .compx import _count_stream

TAG_NAMES = {
    0: "End", 1: "ShowFrame", 2: "DefineShape",
    9: "SetBackgroundColor", 12: "DoAction",
    21: "DefineBitsJPEG2", 22: "DefineShape2",
    26: "PlaceObject2", 35: "DefineBitsJPEG3",
    36: "DefineBitsLossless2", 39: "DefineSprite",
    43: "FrameLabel", 46: "DefineMorphShape",
    69: "FileAttributes", 76: "SymbolClass",
    77: "Metadata", 82: "DoABC", 86: "DefineSceneAndFrameLabelData",
    87: "DefineBinaryData", 88: "DefineFontName",
}


def _rect(b: bytes) -> tuple[int, int, int] | None:
    """bit-packed RECT at offset 0 -> (width_px, height_px,
    n_bytes_consumed)."""
    if not b:
        return None
    nbits = b[0] >> 3
    total_bits = 5 + 4 * nbits
    nbytes = (total_bits + 7) // 8
    if len(b) < nbytes:
        return None
    acc = int.from_bytes(b[:nbytes], "big")
    acc >>= nbytes * 8 - total_bits
    vals = []
    for i in range(4):
        shift = (3 - i) * nbits
        v = (acc >> shift) & ((1 << nbits) - 1) if nbits else 0
        # RECT fields are SIGNED nbits values per the SWF spec (r6,
        # ADVICE r5): sign-extend so negative xmin/ymin stages get
        # the right width/height
        if nbits and v & (1 << (nbits - 1)):
            v -= 1 << nbits
        vals.append(v)
    xmin, xmax, ymin, ymax = vals
    return ((xmax - xmin) // 20, (ymax - ymin) // 20, nbytes)


def parse_swf(payload) -> dict | None:
    """swf bytes -> {"compression", "version", "declared_len",
    "width_px", "height_px", "frame_rate", "frame_count",
    "tags": [(code, name, n, bytes)]} or None for junk. Never
    raises. ZWS rows carry header fields with NULL stage/tags."""
    if not isinstance(payload, (bytes, bytearray)) or \
            len(payload) < 9:
        return None
    b = bytes(payload)
    sig = b[:3]
    if sig not in (b"FWS", b"CWS", b"ZWS"):
        return None
    version = b[3]
    (declared,) = struct.unpack_from("<I", b, 4)
    if declared > 1 << 31:
        declared = None
    out: dict = {"compression": {b"FWS": "none", b"CWS": "zlib",
                                 b"ZWS": "lzma"}[sig],
                 "version": version, "declared_len": declared,
                 "width_px": None, "height_px": None,
                 "frame_rate": None, "frame_count": None,
                 "tags": []}
    if sig == b"ZWS":
        return out                     # header-indexed only
    if sig == b"CWS":
        cap = min(declared or (64 << 20), 64 << 20)
        try:
            d = zlib.decompressobj()
            body = d.decompress(b[8:], cap)
            if not d.eof and _count_stream(
                    zlib.decompressobj(), b[8:]) is None:
                pass  # truncated stream: keep what inflated
        except (zlib.error, MemoryError):
            return out
    else:
        body = b[8:]
        if declared is not None:
            body = body[:max(declared - 8, 0)]
    r = _rect(body)
    if r is None:
        return out
    w, h, consumed = r
    out["width_px"], out["height_px"] = w, h
    off = consumed
    if off + 4 > len(body):
        return out
    # frame rate is 8.8 fixed little-endian: integer part is the
    # HIGH byte
    out["frame_rate"] = body[off + 1]
    (out["frame_count"],) = struct.unpack_from("<H", body, off + 2)
    off += 4
    census: dict[int, list[int]] = {}
    for _ in range(100_000):
        if off + 2 > len(body):
            break
        (head,) = struct.unpack_from("<H", body, off)
        off += 2
        code, ln = head >> 6, head & 0x3F
        if ln == 0x3F:
            if off + 4 > len(body):
                break
            (ln,) = struct.unpack_from("<I", body, off)
            off += 4
            if ln > len(body):
                break
        ent = census.setdefault(code, [0, 0])
        ent[0] += 1
        ent[1] += ln
        off += ln
        if code == 0:                  # End tag
            break
    out["tags"] = [(code, TAG_NAMES.get(code), n, tb)
                   for code, (n, tb) in sorted(census.items())]
    return out


# --- encode half (fixtures) --------------------------------------------------

def build_swf(width_px: int, height_px: int, frame_rate: int,
              tags: list[tuple[int, bytes]], version: int = 9,
              compress: bool = False) -> bytes:
    """Minimal SWF; tags = [(code, body)] (End appended)."""
    vals = [0, width_px * 20, 0, height_px * 20]
    # signed fields: one sign bit above the widest magnitude
    nbits = max(max(v.bit_length() for v in vals) + 1, 1)
    acc = nbits << (4 * nbits)
    for i, v in enumerate(vals):
        acc |= v << ((3 - i) * nbits)
    total_bits = 5 + 4 * nbits
    nbytes = (total_bits + 7) // 8
    acc <<= nbytes * 8 - total_bits
    rect = acc.to_bytes(nbytes, "big")
    frames = sum(1 for c, _ in tags if c == 1)
    body = rect + bytes([0, frame_rate]) \
        + struct.pack("<H", frames)
    for code, data in list(tags) + [(0, b"")]:
        if len(data) >= 0x3F:
            body += struct.pack("<HI", (code << 6) | 0x3F,
                                len(data)) + data
        else:
            body += struct.pack("<H", (code << 6) | len(data)) \
                + data
    raw = struct.pack("<I", 8 + len(body))
    if compress:
        return b"CWS" + bytes([version]) + raw \
            + zlib.compress(body, 9)
    return b"FWS" + bytes([version]) + raw + body
