"""MP4 / ISO-BMFF (MPEG-4 Part 12) box reader — pure Python, from
scratch.

Video payloads in a multimodal corpus are opaque binaries with typed
metadata (the multimodal-columns rule); this member of the media
family reads that metadata for real: the box tree, ftyp brands, movie
duration, and per-track handler/codec/dimensions/language — the
fields a training pipeline filters and buckets on (frame-sample rates
come from duration; language routing from mdhd).  Decoding actual
sample data stays out of scope (the documented ffmpeg production
swap), but the container walk is real and tested.

Format shape (ISO/IEC 14496-12):

- a box is ``[u32 size][4cc type][payload]``; ``size == 1`` switches
  to a following u64 largesize; ``size == 0`` runs to EOF; children
  of container boxes (moov/trak/mdia/minf/stbl/edts/udta) nest
  directly in the payload
- ``ftyp``: major brand + compatible brands (4cc each)
- ``mvhd`` v0/v1: movie timescale + duration
- ``tkhd`` v0/v1: track id, duration (movie timescale), width/height
  as 16.16 fixed point
- ``mdhd`` v0/v1: media timescale + duration + packed 5-bit ISO-639-2
  language
- ``hdlr``: handler 4cc (vide / soun / text / ...)
- ``stsd``: entry count + first sample-entry 4cc = the codec

``make_mp4`` is the encode half for fixtures (the exifx rule: spliced
payloads must themselves decode).  Everything degrades to None/empty
on truncation — never raises (F5).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

_CONTAINERS = frozenset((b"moov", b"trak", b"mdia", b"minf", b"stbl",
                         b"edts", b"udta", b"mvex"))
_MAX_DEPTH = 8


@dataclass
class Mp4Track:
    track_id: int
    handler: str       # vide | soun | text | '' when absent
    codec: str         # first stsd sample-entry 4cc ('' when absent)
    width: int         # tkhd 16.16 integer part (0 for sound)
    height: int
    duration_ms: int   # mdhd duration scaled by its own timescale
    lang: str          # ISO-639-2 from mdhd ('und' default)


@dataclass
class Mp4Info:
    brand: str
    compatible: str        # comma-joined compatible brands
    timescale: int
    duration_ms: int
    n_boxes: int           # total boxes walked (fixtures pin this)
    tracks: list[Mp4Track] = field(default_factory=list)


def is_mp4(payload: bytes | None) -> bool:
    return bool(payload) and len(payload) >= 12 \
        and payload[4:8] == b"ftyp"


def walk_boxes(data: bytes, depth: int = 0, base: int = 0
               ) -> list[tuple[int, bytes, int, int]]:
    """Flat preorder (depth, type, payload_offset, payload_size) over
    the box tree; truncated/absurd sizes end the walk of that level
    (degrade, never raise)."""
    out: list[tuple[int, bytes, int, int]] = []
    if depth > _MAX_DEPTH:
        return out
    i, n = 0, len(data)
    while i + 8 <= n:
        size = struct.unpack_from(">I", data, i)[0]
        btype = data[i + 4:i + 8]
        head = 8
        if size == 1:
            if i + 16 > n:
                break
            size = struct.unpack_from(">Q", data, i + 8)[0]
            head = 16
        elif size == 0:
            size = n - i
        if size < head or i + size > n:
            break
        out.append((depth, btype, base + i + head, size - head))
        if btype in _CONTAINERS:
            out.extend(walk_boxes(data[i + head:i + size],
                                  depth + 1, base + i + head))
        i += size
    return out


def _versioned(payload: bytes, v0_fmt: str, v1_fmt: str
               ) -> tuple | None:
    """FullBox field unpack: version byte picks the 32- or 64-bit
    layout; None on truncation."""
    if len(payload) < 4:
        return None
    version = payload[0]
    fmt = v1_fmt if version == 1 else v0_fmt
    if len(payload) < 4 + struct.calcsize(fmt):
        return None
    return struct.unpack_from(fmt, payload, 4)


def _lang(code: int) -> str:
    """mdhd packed 5-bit ISO-639-2 (each char stored as c - 0x60)."""
    chars = [((code >> s) & 0x1F) + 0x60 for s in (10, 5, 0)]
    if all(0x61 <= c <= 0x7A for c in chars):
        return bytes(chars).decode("ascii")
    return "und"


def parse_mp4(payload: bytes | None) -> Mp4Info | None:
    """Container metadata; None for non-MP4 payloads."""
    if not is_mp4(payload):
        return None
    boxes = walk_boxes(payload)
    info = Mp4Info("", "", 0, 0, len(boxes))
    track: Mp4Track | None = None
    for depth, btype, off, size in boxes:
        body = payload[off:off + size]
        if btype == b"ftyp" and not info.brand:
            info.brand = body[:4].decode("ascii", "replace")
            info.compatible = ",".join(
                body[k:k + 4].decode("ascii", "replace")
                for k in range(8, min(len(body) - 3, 32), 4))
        elif btype == b"mvhd":
            f = _versioned(body, ">IIII", ">QQIQ")
            if f:
                # v0: creation, modification, timescale, duration
                # v1: creation, modification (u64), timescale, duration
                info.timescale = f[2]
                if f[2]:
                    info.duration_ms = f[3] * 1000 // f[2]
        elif btype == b"trak":
            track = Mp4Track(0, "", "", 0, 0, 0, "und")
            info.tracks.append(track)
        elif btype == b"tkhd" and track is not None:
            f = _versioned(body, ">IIIII", ">QQIIQ")
            if f:
                track.track_id = f[2]
                # width/height: last 8 bytes of the box, 16.16 fixed
                if len(body) >= 8:
                    w, h = struct.unpack_from(">II", body, len(body) - 8)
                    track.width, track.height = w >> 16, h >> 16
        elif btype == b"mdhd" and track is not None:
            f = _versioned(body, ">IIIIH", ">QQIQH")
            if f:
                ts, dur, lang = f[2], f[3], f[4]
                if ts:
                    track.duration_ms = dur * 1000 // ts
                track.lang = _lang(lang)
        elif btype == b"hdlr" and track is not None:
            if len(body) >= 12:
                track.handler = body[8:12].decode("ascii", "replace")
        elif btype == b"stsd" and track is not None:
            if len(body) >= 16:
                track.codec = body[12:16].decode("ascii", "replace")
    return info


# --- encode half (fixtures) ---------------------------------------------------

def _box(btype: bytes, payload: bytes, large: bool = False) -> bytes:
    if large:
        return (struct.pack(">I", 1) + btype
                + struct.pack(">Q", len(payload) + 16) + payload)
    return struct.pack(">I", len(payload) + 8) + btype + payload


def _pack_lang(lang: str) -> int:
    code = 0
    for ch in (lang or "und")[:3].ljust(3, "d"):
        code = (code << 5) | ((ord(ch) - 0x60) & 0x1F)
    return code


def make_mp4(brand: str = "isom", timescale: int = 1000,
             duration: int = 0, tracks: list[dict] | None = None,
             version: int = 0, large_mdat: bool = False,
             compatible: tuple[str, ...] = ("isom", "mp42")) -> bytes:
    """Minimal-but-real MP4: ftyp + moov(mvhd + trak*) + mdat stub.
    ``tracks`` entries: ``{"track_id", "handler", "codec", "width"?,
    "height"?, "duration"?, "timescale"?, "lang"?}``.  ``version=1``
    emits 64-bit mvhd/tkhd/mdhd layouts; ``large_mdat`` exercises the
    largesize path."""
    ftyp = _box(b"ftyp", brand.encode("ascii").ljust(4)[:4]
                + struct.pack(">I", 0)
                + b"".join(c.encode("ascii").ljust(4)[:4]
                           for c in compatible))
    if version == 1:
        mvhd_body = (b"\x01\x00\x00\x00"
                     + struct.pack(">QQIQ", 0, 0, timescale, duration))
    else:
        mvhd_body = (b"\x00\x00\x00\x00"
                     + struct.pack(">IIII", 0, 0, timescale, duration))
    mvhd_body += b"\x00" * 80      # rate/volume/matrix/next-track fill
    kids = [_box(b"mvhd", mvhd_body)]
    for t in tracks or []:
        if version == 1:
            tkhd_body = (b"\x01\x00\x00\x07" + struct.pack(
                ">QQIIQ", 0, 0, t["track_id"], 0, t.get("duration", 0)))
        else:
            tkhd_body = (b"\x00\x00\x00\x07" + struct.pack(
                ">IIIII", 0, 0, t["track_id"], 0, t.get("duration", 0)))
        tkhd_body += b"\x00" * 44  # layer/volume/matrix fill
        tkhd_body += struct.pack(">II", t.get("width", 0) << 16,
                                 t.get("height", 0) << 16)
        mts = t.get("timescale", timescale)
        if version == 1:
            mdhd_body = (b"\x01\x00\x00\x00" + struct.pack(
                ">QQIQH", 0, 0, mts, t.get("duration", 0),
                _pack_lang(t.get("lang", "und"))) + b"\x00\x00")
        else:
            mdhd_body = (b"\x00\x00\x00\x00" + struct.pack(
                ">IIIIH", 0, 0, mts, t.get("duration", 0),
                _pack_lang(t.get("lang", "und"))) + b"\x00\x00")
        hdlr_body = (b"\x00\x00\x00\x00" + b"\x00" * 4
                     + t["handler"].encode("ascii").ljust(4)[:4]
                     + b"\x00" * 12 + b"fixture\x00")
        stsd_body = (b"\x00\x00\x00\x00" + struct.pack(">I", 1)
                     + _box(t["codec"].encode("ascii").ljust(4)[:4],
                            b"\x00" * 24))
        stbl = _box(b"stbl", _box(b"stsd", stsd_body))
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", _box(b"mdhd", mdhd_body)
                    + _box(b"hdlr", hdlr_body) + minf)
        kids.append(_box(b"trak", _box(b"tkhd", tkhd_body) + mdia))
    moov = _box(b"moov", b"".join(kids))
    mdat = _box(b"mdat", b"\x00" * 32, large=large_mdat)
    return ftyp + moov + mdat
