"""ICC color-profile reader — pure Python, from scratch over the
published ICC.1 layout, Spark-free.

Profiles ride JPEGs (APP2), PNGs (iCCP) and standalone .icc files;
the engine's view joins the imagex/exifx world: the 128-byte
header (device class, color space, PCS, version, rendering
intent, creation timestamp as exact epoch-free Y-M-D fields,
'acsp' magic), and the tag table with description text decoded
from both encodings the spec allows ('desc' ASCII
textDescriptionType and 'mluc' UTF-16BE multiLocalizedUnicode —
first record). Wtpt/chromaticity numerics stay raw s15Fixed16
integers — exact, no float conversion (the gpxx no-transcendental
rule).
"""

from __future__ import annotations

_CLASSES = {"mntr": "display", "scnr": "input", "prtr": "output",
            "link": "devicelink", "spac": "colorspace",
            "abst": "abstract", "nmcl": "namedcolor"}
_INTENTS = {0: "perceptual", 1: "relative", 2: "saturation",
            3: "absolute"}


def _u32(b, o):
    return int.from_bytes(b[o:o + 4], "big")


def _sig(b, o):
    return b[o:o + 4].decode("latin-1").strip("\x00 ")


def _text_of(tag: bytes) -> str | None:
    """tag data -> description text ('desc'/'mluc'/'text')."""
    if len(tag) < 8:
        return None
    t = tag[:4]
    try:
        if t == b"desc":
            n = _u32(tag, 8)
            raw = tag[12:12 + n]
            return raw.split(b"\x00")[0].decode(
                "latin-1") or None
        if t == b"mluc":
            cnt = _u32(tag, 8)
            if cnt < 1 or len(tag) < 28:
                return None
            ln = _u32(tag, 20)
            off = _u32(tag, 24)
            return tag[off:off + ln].decode(
                "utf-16-be", "replace") or None
        if t == b"text":
            return tag[8:].split(b"\x00")[0].decode(
                "latin-1") or None
    except (UnicodeDecodeError, IndexError):
        return None
    return None


def parse_icc(payload) -> dict:
    """payload -> {"ok": bool, header fields..., "tags": [(pos,
    sig, offset, size, text)]}; never raises; ok False for junk.
    text is decoded only for description-bearing tag types."""
    out: dict = {"ok": False, "profile_class": None,
                 "color_space": None, "pcs": None,
                 "version": None, "intent": None,
                 "created": None, "n_tags": None, "tags": []}
    if not isinstance(payload, (bytes, bytearray)) or \
            len(payload) < 132 or payload[36:40] != b"acsp":
        return out
    b = bytes(payload)
    size = _u32(b, 0)
    if size < 132:
        return out
    out["ok"] = True
    major, minor = b[8], b[9]
    out["version"] = f"{major}.{minor >> 4}.{minor & 15}"
    cls = _sig(b, 12)
    out["profile_class"] = _CLASSES.get(cls, cls)
    out["color_space"] = _sig(b, 16)
    out["pcs"] = _sig(b, 20)
    y, mo, d, h, mi, s = (int.from_bytes(b[24 + 2 * i:26 + 2 * i],
                                         "big") for i in range(6))
    if 1900 <= y <= 4000 and 1 <= mo <= 12 and 1 <= d <= 31:
        out["created"] = f"{y:04d}-{mo:02d}-{d:02d}T" \
                         f"{h:02d}:{mi:02d}:{s:02d}"
    out["intent"] = _INTENTS.get(_u32(b, 64), str(_u32(b, 64)))
    n = _u32(b, 128)
    # Int32-column clamp: raw u32 -> NULL past int32 (walk is
    # capped separately)
    out["n_tags"] = n if n <= 0x7FFFFFFF else None
    for i in range(min(n, 200) if out["n_tags"] is not None
                   else 0):
        p = 132 + 12 * i
        if p + 12 > len(b):
            break
        sig = _sig(b, p)
        off, sz = _u32(b, p + 4), _u32(b, p + 8)
        text = None
        if off + sz <= len(b) and sz >= 8:
            text = _text_of(b[off:off + sz])
        out["tags"].append((i, sig, off, sz, text))
    return out
