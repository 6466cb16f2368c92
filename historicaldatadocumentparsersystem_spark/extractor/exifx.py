"""Embedded media metadata extraction (Spark-free, pure Python).

Images carry provenance a multimodal training pipeline wants —
capture time, camera make, orientation (pixels need rotating before
any vision model sees them), pixel dimensions as-declared — and in
crawl data it arrives as EXIF (a TIFF IFD tree inside the JPEG APP1
segment), PNG ``tEXt`` chunks, and GIF comment extensions. This
module parses all three from scratch (stdlib-only, matching the repo's
from-scratch PNG/GIF/JPEG codecs): an EXIF reader supporting both
byte orders, IFD chaining (IFD0 -> Exif sub-IFD -> GPS sub-IFD), and
the TIFF value types; a PNG chunk walker for ``tEXt``; a GIF
extension walker for comment blocks. Reference analog: the engine's
image loaders surface per-image metadata alongside pixels
(multimodal_RAG_methods.py keeps image metadata next to embeddings).

This module is the correctness oracle: the Spark operator
(``operators/multimodal.py:media_metadata``) calls the same function
from a mapInPandas batch, so golden-parquet parity is structural.

Output rows per payload: ``(fmt, idx, key, value)``:
- ``fmt``: 'jpeg-exif' | 'png-text' | 'gif-comment' (sniffed from
  magic bytes);
- ``idx``: encounter order within the payload;
- ``key``: the EXIF tag name (``TAG_NAMES``; unknown tags render as
  ``0x%04x``), the tEXt keyword, or 'comment';
- ``value``: deterministic string rendering — ASCII values with the
  trailing NUL stripped, RATIONALs as 'num/den', numeric arrays
  space-joined, UNDEFINED bytes hex-encoded (capped at 64 hex chars).

Determinism contract: IFDs walk in (IFD0, Exif, GPS) order, entries
in on-disk order; sub-IFD pointer tags themselves are not emitted;
offsets are bounds-checked and cycles are impossible (each sub-IFD
visited once, next-IFD chaining ignored — thumbnails are IFD1);
malformed payloads degrade to fewer rows, never raise (F5).
"""
from __future__ import annotations

import struct

TAG_NAMES = {
    0x010E: "ImageDescription", 0x010F: "Make", 0x0110: "Model",
    0x0112: "Orientation", 0x011A: "XResolution",
    0x011B: "YResolution", 0x0128: "ResolutionUnit",
    0x0131: "Software", 0x0132: "DateTime", 0x013B: "Artist",
    0x8298: "Copyright",
    0x829A: "ExposureTime", 0x829D: "FNumber", 0x8827: "ISOSpeed",
    0x9003: "DateTimeOriginal", 0x9004: "DateTimeDigitized",
    0x920A: "FocalLength", 0xA002: "PixelXDimension",
    0xA003: "PixelYDimension", 0xA433: "LensMake", 0xA434: "LensModel",
    0x0000: "GPSVersionID", 0x0001: "GPSLatitudeRef",
    0x0002: "GPSLatitude", 0x0003: "GPSLongitudeRef",
    0x0004: "GPSLongitude", 0x0006: "GPSAltitude",
}
_EXIF_PTR, _GPS_PTR = 0x8769, 0x8825
# TIFF type -> (struct code, size); 2/7 handled as bytes
_TYPES = {1: ("B", 1), 2: (None, 1), 3: ("H", 2), 4: ("I", 4),
          5: ("II", 8), 6: ("b", 1), 7: (None, 1), 8: ("h", 2),
          9: ("i", 4), 10: ("ii", 8)}


def _render(vtype: int, raw: bytes, endian: str) -> str | None:
    if vtype == 2:                          # ASCII, strip trailing NULs
        return raw.split(b"\x00")[0].decode("ascii", "replace")
    if vtype == 7:                          # UNDEFINED -> capped hex
        return raw[:32].hex()
    spec = _TYPES.get(vtype)
    if spec is None or spec[0] is None:
        return None
    code, size = spec
    n = len(raw) // size
    if n == 0:
        return None
    parts = []
    for i in range(n):
        chunk = raw[i * size:(i + 1) * size]
        if vtype in (5, 10):                # (S)RATIONAL -> num/den
            num, den = struct.unpack(endian + code, chunk)
            parts.append(f"{num}/{den}")
        else:
            parts.append(str(struct.unpack(endian + code, chunk)[0]))
    return " ".join(parts)


def _parse_ifd(tiff: bytes, offset: int, endian: str,
               out: list, gps: bool) -> dict[int, int]:
    """Append (tag, value) rows for one IFD; return sub-IFD pointers
    {tag: offset} found in it."""
    pointers: dict[int, int] = {}
    if offset + 2 > len(tiff):
        return pointers
    (count,) = struct.unpack(endian + "H", tiff[offset:offset + 2])
    for i in range(count):
        base = offset + 2 + i * 12
        entry = tiff[base:base + 12]
        if len(entry) < 12:
            break
        tag, vtype, n = struct.unpack(endian + "HHI", entry[:8])
        spec = _TYPES.get(vtype)
        if spec is None or n > 1 << 20:
            continue
        size = spec[1] * n
        if size <= 4:
            raw = entry[8:8 + size]
        else:
            (voff,) = struct.unpack(endian + "I", entry[8:12])
            if voff + size > len(tiff):
                continue
            raw = tiff[voff:voff + size]
        if tag in (_EXIF_PTR, _GPS_PTR) and vtype == 4 and n == 1:
            pointers[tag] = struct.unpack(endian + "I", raw)[0]
            continue
        value = _render(vtype, raw, endian)
        if value is None:
            continue
        # GPS tag ids live in 0x0000-0x0006 and collide with the low
        # TIFF range: only the GPS IFD resolves them through TAG_NAMES
        if gps:
            name = TAG_NAMES.get(tag) if tag <= 0x0006 else None
        else:
            name = TAG_NAMES.get(tag) if tag > 0x0006 else None
        out.append((name or f"0x{tag:04x}", value))
    return pointers


def parse_exif(tiff: bytes) -> list[tuple[str, str]]:
    """(tag_name, value) rows from a TIFF-structured EXIF body
    (the bytes AFTER the APP1 'Exif\\0\\0' marker)."""
    out: list[tuple[str, str]] = []
    if len(tiff) < 8:
        return out
    order = tiff[:2]
    if order == b"II":
        endian = "<"
    elif order == b"MM":
        endian = ">"
    else:
        return out
    magic, ifd0 = struct.unpack(endian + "HI", tiff[2:8])
    if magic != 42:
        return out
    pointers = _parse_ifd(tiff, ifd0, endian, out, gps=False)
    if _EXIF_PTR in pointers:
        _parse_ifd(tiff, pointers[_EXIF_PTR], endian, out, gps=False)
    if _GPS_PTR in pointers:
        _parse_ifd(tiff, pointers[_GPS_PTR], endian, out, gps=True)
    return out


def _jpeg_exif(payload: bytes) -> list[tuple[str, str]]:
    """Walk JPEG segments for APP1/Exif; parse the first one found."""
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            break
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xDA:                  # start of scan: no more
            break
        (seglen,) = struct.unpack(">H", payload[i + 2:i + 4])
        if seglen < 2:
            break
        body = payload[i + 4:i + 2 + seglen]
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            return parse_exif(body[6:])
        i += 2 + seglen
    return []


def _png_text(payload: bytes) -> list[tuple[str, str]]:
    """(keyword, text) from uncompressed tEXt chunks, file order."""
    out = []
    i = 8
    n = len(payload)
    while i + 8 <= n:
        (length,) = struct.unpack(">I", payload[i:i + 4])
        ctype = payload[i + 4:i + 8]
        if length > n:
            break
        if ctype == b"tEXt":
            body = payload[i + 8:i + 8 + length]
            if b"\x00" in body:
                key, _, text = body.partition(b"\x00")
                out.append((key.decode("latin-1"),
                            text.decode("latin-1")))
        if ctype == b"IEND":
            break
        i += 12 + length                    # len + type + crc
    return out


def _gif_comments(payload: bytes) -> list[tuple[str, str]]:
    """('comment', text) rows from GIF comment extensions, file order.
    Walks the block stream (skipping image data sub-blocks) so
    comments anywhere in the file are found."""
    out = []
    if len(payload) < 13:
        return out
    flags = payload[10]
    i = 13 + (3 * (2 << (flags & 7)) if flags & 0x80 else 0)
    n = len(payload)

    def skip_subblocks(j: int) -> int:
        while j < n and payload[j] != 0:
            j += 1 + payload[j]
        return j + 1

    while i < n:
        b = payload[i]
        if b == 0x3B:                       # trailer
            break
        if b == 0x21 and i + 1 < n:         # extension
            label = payload[i + 1]
            j = i + 2
            if label == 0xFE:               # comment
                parts = []
                while j < n and payload[j] != 0:
                    sz = payload[j]
                    parts.append(payload[j + 1:j + 1 + sz])
                    j += 1 + sz
                out.append(("comment",
                            b"".join(parts).decode("latin-1")))
                i = j + 1
            else:
                i = skip_subblocks(j)
        elif b == 0x2C:                     # image descriptor
            i += 9
            if i >= n:
                break
            if payload[i] & 0x80:           # local color table
                i += 3 * (2 << (payload[i] & 7))
            i += 2                          # flags byte + LZW min code
            i = skip_subblocks(i)
        else:
            break
    return out


def _wav_info(payload: bytes) -> list[tuple[str, str]]:
    """(key, text) rows from RIFF LIST/INFO sub-chunks (IART, INAM,
    ICMT, ...), file order; chunks pad to even length per RIFF."""
    out = []
    i = 12
    n = len(payload)
    while i + 8 <= n:
        ckid = payload[i:i + 4]
        (size,) = struct.unpack("<I", payload[i + 4:i + 8])
        body = payload[i + 8:i + 8 + size]
        if ckid == b"LIST" and body[:4] == b"INFO":
            j = 4
            while j + 8 <= len(body):
                key = body[j:j + 4]
                (sz,) = struct.unpack("<I", body[j + 4:j + 8])
                text = body[j + 8:j + 8 + sz].split(b"\x00")[0]
                out.append((key.decode("latin-1"),
                            text.decode("latin-1")))
                j += 8 + sz + (sz & 1)
        i += 8 + size + (size & 1)
    return out


def _mp4_meta(payload: bytes) -> list[tuple[str, str]]:
    """(key, value) rows from the ISO-BMFF box tree: ftyp brand,
    mvhd timescale/duration, trak count — the header facts a video
    pipeline partitions on before any (external) frame decode."""
    out = []
    n = len(payload)

    def boxes(start: int, end: int):
        i = start
        while i + 8 <= end:
            (size,) = struct.unpack(">I", payload[i:i + 4])
            btype = payload[i + 4:i + 8]
            if size == 1 or size < 8 or i + size > end:
                break                       # 64-bit sizes out of scope
            yield btype, i + 8, i + size
            i += size

    n_tracks = 0
    for btype, body, bend in boxes(0, n):
        if btype == b"ftyp" and bend - body >= 4:
            out.append(("brand",
                        payload[body:body + 4].decode("latin-1")))
        elif btype == b"moov":
            for ib, ibody, ibend in boxes(body, bend):
                if ib == b"mvhd" and ibend - ibody >= 20:
                    ver = payload[ibody]
                    if ver == 0:
                        ts, dur = struct.unpack(
                            ">II", payload[ibody + 12:ibody + 20])
                        out.append(("timescale", str(ts)))
                        out.append(("duration", str(dur)))
                elif ib == b"trak":
                    n_tracks += 1
    if n_tracks:
        out.append(("n_tracks", str(n_tracks)))
    return out


def extract_media_metadata(payload) -> list[tuple[str, int, str, str]]:
    """(fmt, idx, key, value) embedded-metadata rows for one media
    payload (see module contract); container sniffed by magic."""
    if payload is None:
        return []
    payload = bytes(payload)
    try:
        if payload[:3] == b"\xff\xd8\xff":
            rows, fmt = _jpeg_exif(payload), "jpeg-exif"
        elif payload[:8] == b"\x89PNG\r\n\x1a\n":
            rows, fmt = _png_text(payload), "png-text"
        elif payload[:6] in (b"GIF87a", b"GIF89a"):
            rows, fmt = _gif_comments(payload), "gif-comment"
        elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            rows, fmt = _wav_info(payload), "wav-info"
        elif payload[4:8] == b"ftyp":
            rows, fmt = _mp4_meta(payload), "mp4-meta"
        elif payload[:4] == b"fLaC":
            from . import soundx
            rows, fmt = soundx.flac_info(payload), "flac-meta"
        elif payload[:4] == b"OggS":
            from . import soundx
            rows, fmt = soundx.ogg_info(payload), "ogg-meta"
        elif payload[:3] == b"ID3":
            from . import soundx
            rows, fmt = soundx.mp3_info(payload), "mp3-meta"
        elif (len(payload) > 3 and payload[0] == 0xFF
                and (payload[1] & 0xE0) == 0xE0):
            # bare frame sync: require a VALID Layer-III header at 0
            # (0xFF 0xFE is also a UTF-16LE BOM — the loose mask
            # misfiled such payloads as mp3)
            from . import soundx
            if soundx._frame_header(payload, 0) is None:
                return []
            rows, fmt = soundx.mp3_info(payload), "mp3-meta"
        else:
            return []
    except Exception:
        return []
    return [(fmt, i, k, v) for i, (k, v) in enumerate(rows)]


# --- fixture-side builders (the encode half, like imagex.encode_*) ----

def build_exif(entries: list[tuple[int, int, object]],
               byte_order: str = "<",
               gps: list[tuple[int, int, object]] | None = None,
               exif_sub: list[tuple[int, int, object]] | None = None
               ) -> bytes:
    """TIFF-structured EXIF body from (tag, type, value) entries —
    the deterministic test-fixture writer (both byte orders, sub-IFD
    pointers, out-of-line values)."""
    endian = byte_order
    order = b"II" if endian == "<" else b"MM"

    def _norm(vtype: int, value) -> list:
        """value -> list of scalar items (pairs for rationals)."""
        if vtype in (5, 10):
            if value and isinstance(value[0], (list, tuple)):
                return list(value)
            return [tuple(value)]           # a single (num, den) pair
        if isinstance(value, (list, tuple)):
            return list(value)
        return [value]

    def pack_value(vtype: int, value) -> bytes:
        code = _TYPES[vtype][0]
        if vtype == 2:
            return value.encode("ascii") + b"\x00"
        if vtype == 7:
            return bytes(value)
        if vtype in (5, 10):
            return b"".join(struct.pack(endian + code, *pair)
                            for pair in _norm(vtype, value))
        return b"".join(struct.pack(endian + code, v)
                        for v in _norm(vtype, value))

    def count_of(vtype: int, value) -> int:
        if vtype == 2:
            return len(value) + 1
        if vtype == 7:
            return len(value)
        return len(_norm(vtype, value))

    def build_ifd(ents: list, ifd_offset: int) -> bytes:
        heap = bytearray()
        heap_base = ifd_offset + 2 + 12 * len(ents) + 4
        body = bytearray(struct.pack(endian + "H", len(ents)))
        for tag, vtype, value in ents:
            raw = pack_value(vtype, value)
            cnt = count_of(vtype, value)
            body += struct.pack(endian + "HHI", tag, vtype, cnt)
            if len(raw) <= 4:
                body += raw.ljust(4, b"\x00")
            else:
                body += struct.pack(endian + "I", heap_base + len(heap))
                heap += raw
        body += struct.pack(endian + "I", 0)    # no next IFD
        return bytes(body + heap)

    ifd0 = list(entries)
    blocks: list[bytes] = []
    off = 8
    # reserve pointer entries, then lay out sub-IFDs after IFD0
    n_ptrs = (exif_sub is not None) + (gps is not None)
    ifd0_size_probe = build_ifd(
        ifd0 + [(0, 4, 0)] * n_ptrs, off)
    sub_off = off + len(ifd0_size_probe)
    if exif_sub is not None:
        ifd0.append((_EXIF_PTR, 4, sub_off))
        block = build_ifd(exif_sub, sub_off)
        blocks.append(block)
        sub_off += len(block)
    if gps is not None:
        ifd0.append((_GPS_PTR, 4, sub_off))
        blocks.append(build_ifd(gps, sub_off))
    out = order + struct.pack(endian + "HI", 42, 8)
    out += build_ifd(ifd0, 8)
    for b in blocks:
        out += b
    return out


def splice_jpeg_exif(jpeg: bytes, tiff: bytes) -> bytes:
    """Insert an APP1/Exif segment right after SOI."""
    body = b"Exif\x00\x00" + tiff
    seg = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    return jpeg[:2] + seg + jpeg[2:]


def splice_png_text(png: bytes, key: str, text: str) -> bytes:
    """Insert a tEXt chunk right after IHDR (keyword latin-1)."""
    import zlib
    body = key.encode("latin-1") + b"\x00" + text.encode("latin-1")
    chunk = (struct.pack(">I", len(body)) + b"tEXt" + body
             + struct.pack(">I", zlib.crc32(b"tEXt" + body)))
    ihdr_end = 8 + 8 + 13 + 4
    return png[:ihdr_end] + chunk + png[ihdr_end:]


def splice_wav_info(wav: bytes, entries: list[tuple[str, str]]) -> bytes:
    """Append a LIST/INFO chunk to a RIFF WAV and fix the RIFF size."""
    body = bytearray(b"INFO")
    for key, text in entries:
        data = text.encode("latin-1") + b"\x00"
        body += key.encode("latin-1") + struct.pack("<I", len(data))
        body += data + (b"\x00" if len(data) & 1 else b"")
    chunk = b"LIST" + struct.pack("<I", len(body)) + bytes(body)
    out = bytearray(wav + chunk)
    out[4:8] = struct.pack("<I", len(out) - 8)
    return bytes(out)


def build_mp4(brand: str = "isom", timescale: int = 1000,
              duration: int = 0, n_tracks: int = 1) -> bytes:
    """Minimal deterministic ISO-BMFF file: ftyp + moov(mvhd v0 +
    trak stubs) + empty mdat — the fixture writer for _mp4_meta."""
    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + btype + body

    ftyp = box(b"ftyp", brand.encode("latin-1")
               + struct.pack(">I", 0) + b"isom")
    mvhd = box(b"mvhd", bytes(4)               # version 0 + flags
               + struct.pack(">II", 0, 0)      # ctime, mtime
               + struct.pack(">II", timescale, duration)
               + bytes(80))                    # rate..next_track_id
    traks = b"".join(box(b"trak", b"") for _ in range(n_tracks))
    return ftyp + box(b"moov", mvhd + traks) + box(b"mdat", b"")


def splice_gif_comment(gif: bytes, text: str) -> bytes:
    """Insert a comment extension right after the global color table."""
    flags = gif[10]
    end = 13 + (3 * (2 << (flags & 7)) if flags & 0x80 else 0)
    data = text.encode("latin-1")
    blocks = bytearray(b"\x21\xfe")
    for i in range(0, len(data), 255):
        part = data[i:i + 255]
        blocks += bytes([len(part)]) + part
    blocks += b"\x00"
    return gif[:end] + bytes(blocks) + gif[end:]
