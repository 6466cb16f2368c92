"""AVI (RIFF) header reader — pure Python over the published
AVI/RIFF layout (msdn AVIMAINHEADER/AVISTREAMHEADER), Spark-free.

The legacy-video sibling of ``mp4_metadata``: RIFF chunk walk
('RIFF' size 'AVI ', LIST containers), the ``avih`` main header
(microseconds/frame -> exact integer fps-milli, dims, declared
frame count) and one row per ``strl``/``strh`` stream header
(vids/auds/txts, fourcc handler, scale/rate -> rate-milli,
length). Index-only — no frames decoded. Never raises; junk ->
None. Chunks are WORD-aligned (odd sizes pad) per RIFF.
"""

from __future__ import annotations

import struct


def _fourcc(b: bytes) -> str:
    return b.decode("latin-1").strip("\x00 ")


def parse_avi(payload) -> dict | None:
    """avi bytes -> {"us_per_frame", "fps_milli", "width",
    "height", "total_frames", "n_streams_declared", "streams":
    [(pos, kind, handler, rate_milli, length)]} or None. Never
    raises."""
    if not isinstance(payload, (bytes, bytearray)) or \
            len(payload) < 24:
        return None
    b = bytes(payload)
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    out: dict = {"us_per_frame": None, "fps_milli": None,
                 "width": None, "height": None,
                 "total_frames": None, "n_streams_declared": None,
                 "streams": []}

    def walk(off: int, end: int, depth: int) -> None:
        while off + 8 <= end and depth <= 8:
            cid = b[off:off + 4]
            (sz,) = struct.unpack_from("<I", b, off + 4)
            body = off + 8
            bend = min(body + sz, end)
            if cid == b"LIST" and sz >= 4:
                walk(body + 4, bend, depth + 1)
            elif cid == b"avih" and sz >= 40:
                (uspf, _mbps, _pad, _flags, frames, _init,
                 nstreams, _bufsz, w, h) = struct.unpack_from(
                    "<10I", b, body)
                if 0 < uspf <= 10_000_000:
                    out["us_per_frame"] = uspf
                    out["fps_milli"] = 1_000_000_000 // uspf
                out["total_frames"] = frames \
                    if frames <= 0x7FFFFFFF else None
                out["n_streams_declared"] = nstreams \
                    if nstreams <= 1024 else None
                out["width"] = w if 0 < w <= 1 << 15 else None
                out["height"] = h if 0 < h <= 1 << 15 else None
            elif cid == b"strh" and sz >= 48:
                ftype = _fourcc(b[body:body + 4])
                handler = _fourcc(b[body + 4:body + 8])
                (scale, rate) = struct.unpack_from(
                    "<II", b, body + 20)
                (length,) = struct.unpack_from("<I", b, body + 32)
                rate_milli = (rate * 1000 // scale
                              if scale and rate else None)
                out["streams"].append(
                    (len(out["streams"]), ftype, handler or None,
                     rate_milli,
                     length if length <= 0x7FFFFFFF else None))
            off = bend + (sz & 1)

    try:
        (total,) = struct.unpack_from("<I", b, 4)
        walk(12, min(8 + total, len(b)), 0)
    except (struct.error, IndexError):
        pass
    return out


# --- encode half (fixtures) --------------------------------------------------

def _chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body \
        + (b"\x00" if len(body) & 1 else b"")


def _list(ltype: bytes, children: list[bytes]) -> bytes:
    body = ltype + b"".join(children)
    return _chunk(b"LIST", body)


def build_avi(us_per_frame: int, width: int, height: int,
              total_frames: int,
              streams: list[tuple[str, str, int, int, int]]
              ) -> bytes:
    """streams = [(kind4cc, handler4cc, scale, rate, length)]."""
    avih = struct.pack("<10I", us_per_frame, 1_000_000, 0, 0x10,
                       total_frames, 0, len(streams), 0x100000,
                       width, height) + b"\x00" * 16
    strls = []
    for (kind, handler, scale, rate, length) in streams:
        strh = (kind.encode().ljust(4)[:4]
                + handler.encode().ljust(4, b"\x00")[:4]
                + struct.pack("<III", 0, 0, 0)
                + struct.pack("<II", scale, rate)
                + struct.pack("<III", 0, length, 0x100000)
                + struct.pack("<iIHH", -1, 0, 0, 0)
                + struct.pack("<HH", width, height))
        strls.append(_list(b"strl", [_chunk(b"strh", strh)]))
    hdrl = _list(b"hdrl", [_chunk(b"avih", avih)] + strls)
    movi = _list(b"movi", [_chunk(b"00dc", b"\x00" * 16)])
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
