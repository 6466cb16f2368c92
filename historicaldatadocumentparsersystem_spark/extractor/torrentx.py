"""BitTorrent metainfo (.torrent / bencode) reader — pure Python,
Spark-free.

Torrent files are a web-corpus discovery channel (open-data mirrors,
Linux ISOs, academic datasets publish via magnet/torrent); the
metainfo dictionary is also the canonical bencode test subject. All
from scratch:

- bencode decode: ``i...e`` integers (leading zeros / ``-0``
  rejected per BEP 3), ``<len>:<bytes>`` strings, ``l...e`` lists,
  ``d...e`` dicts (keys must be byte strings; unsorted keys are
  TOLERATED — real-world encoders emit them — but duplicate keys
  reject); depth-capped;
- the decoder is SPAN-AWARE: ``parse_torrent`` records the byte
  span of the ``info`` value and computes the infohash as sha1 over
  those exact payload bytes (the BEP 3 identity — re-encoding would
  break non-canonical files);
- metainfo fields: announce, flattened announce-list tiers,
  creation date (epoch int), created by, comment, and the info
  dict: name, piece length, piece count (len(pieces)/20), private
  flag, files as (path joined with '/', length) — single-file mode
  yields one file named by ``name``.

``encode_bencode`` is the encode half for fixtures (canonical
sorted keys) and must decode through this parser.
"""

from __future__ import annotations

import hashlib
import re

_INT_RE = re.compile(rb"-?(0|[1-9]\d*)")


class BencodeError(ValueError):
    pass


def _decode(data: bytes, off: int, depth: int = 0,
            spans: dict | None = None, path: tuple = ()):
    if depth > 32:
        raise BencodeError("nesting too deep")
    if off >= len(data):
        raise BencodeError("truncated")
    c = data[off:off + 1]
    if c == b"i":
        end = data.find(b"e", off)
        if end < 0:
            raise BencodeError("unterminated integer")
        body = data[off + 1:end]
        if not _INT_RE.fullmatch(body) or body == b"-0":
            raise BencodeError("bad integer")
        return int(body), end + 1
    if c == b"l":
        out = []
        off += 1
        while True:
            if off >= len(data):
                raise BencodeError("unterminated list")
            if data[off:off + 1] == b"e":
                return out, off + 1
            v, off = _decode(data, off, depth + 1, spans, path)
            out.append(v)
    if c == b"d":
        out = {}
        off += 1
        while True:
            if off >= len(data):
                raise BencodeError("unterminated dict")
            if data[off:off + 1] == b"e":
                return out, off + 1
            k, off = _decode(data, off, depth + 1)
            if not isinstance(k, bytes):
                raise BencodeError("non-string dict key")
            if k in out:
                raise BencodeError("duplicate dict key")
            start = off
            v, off = _decode(data, off, depth + 1, spans,
                             path + (k,))
            if spans is not None:
                spans[path + (k,)] = (start, off)
            out[k] = v
        # unreachable
    if c.isdigit():
        colon = data.find(b":", off)
        if colon < 0:
            raise BencodeError("unterminated string length")
        ln_bytes = data[off:colon]
        if not ln_bytes.isdigit() or (
                len(ln_bytes) > 1 and ln_bytes[0:1] == b"0"):
            raise BencodeError("bad string length")
        n = int(ln_bytes)
        end = colon + 1 + n
        if end > len(data):
            raise BencodeError("string overruns buffer")
        return data[colon + 1:end], end
    raise BencodeError(f"bad type byte {c!r}")


def decode_bencode(data: bytes):
    """Whole-buffer decode; trailing bytes reject."""
    v, off = _decode(bytes(data), 0)
    if off != len(data):
        raise BencodeError("trailing bytes")
    return v


def encode_bencode(v) -> bytes:
    if isinstance(v, bool):
        raise BencodeError("bool is not bencode")
    if isinstance(v, int):
        return b"i" + str(v).encode() + b"e"
    if isinstance(v, str):
        v = v.encode("utf-8")
    if isinstance(v, (bytes, bytearray)):
        return str(len(v)).encode() + b":" + bytes(v)
    if isinstance(v, list):
        return b"l" + b"".join(encode_bencode(x) for x in v) + b"e"
    if isinstance(v, dict):
        items = sorted(
            (k.encode("utf-8") if isinstance(k, str) else bytes(k), x)
            for k, x in v.items())
        return b"d" + b"".join(
            encode_bencode(k) + encode_bencode(x)
            for k, x in items) + b"e"
    raise BencodeError(f"unencodable {type(v)}")


def _txt(v):
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    return v if isinstance(v, str) else None


def _posint(v, cap: int = 2**62):
    return v if isinstance(v, int) and 0 <= v <= cap else None


def parse_torrent(payload) -> dict | None:
    """Metainfo bytes -> flat dict, or None when the payload is not
    a metainfo dictionary. Never raises."""
    if payload is None:
        return None
    try:
        spans: dict = {}
        doc, off = _decode(bytes(payload), 0, spans=spans)
        if off != len(payload) or not isinstance(doc, dict):
            return None
        info = doc.get(b"info")
        if not isinstance(info, dict):
            return None
    except (BencodeError, ValueError, TypeError):
        return None
    span = spans.get((b"info",))
    infohash = (hashlib.sha1(
        bytes(payload)[span[0]:span[1]]).hexdigest()
        if span else None)
    tiers = doc.get(b"announce-list")
    trackers: list[tuple[int, str]] = []
    if isinstance(tiers, list):
        for t_idx, tier in enumerate(tiers):
            if not isinstance(tier, list):
                continue
            for u in tier:
                if isinstance(u, bytes):
                    trackers.append((t_idx, _txt(u)))
    name = _txt(info.get(b"name"))
    files: list[tuple[str, int]] = []
    raw_files = info.get(b"files")
    if isinstance(raw_files, list):           # multi-file mode
        for f in raw_files:
            if not isinstance(f, dict):
                continue
            parts = f.get(b"path")
            if not isinstance(parts, list):
                continue
            path = "/".join(_txt(p) for p in parts
                            if isinstance(p, bytes))
            length = _posint(f.get(b"length"))
            if path and length is not None:
                files.append((path, length))
    elif _posint(info.get(b"length")) is not None and name:
        files.append((name, info[b"length"]))
    pieces = info.get(b"pieces")
    n_pieces = (len(pieces) // 20
                if isinstance(pieces, bytes) else None)
    return {
        "announce": _txt(doc.get(b"announce")),
        "trackers": trackers,
        "creation_date": _posint(doc.get(b"creation date")),
        "created_by": _txt(doc.get(b"created by")),
        "comment": _txt(doc.get(b"comment")),
        "name": name,
        "piece_length": _posint(info.get(b"piece length")),
        "n_pieces": n_pieces,
        "private": info.get(b"private") == 1,
        "files": files,
        "infohash": infohash,
    }
