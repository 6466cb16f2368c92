"""OpenPGP armor + packet census — pure Python over RFC 4880,
Spark-free.

Keys and signatures are a real web-corpus surface
(security.txt's Encryption: targets, SKS dumps, signed releases,
.well-known/openpgpkey). The engine's view is index-shaped: the
armor envelope (block kind, armor headers, the radix-64 CRC24
actually recomputed) and a packet walk (old AND new format
headers, the four length encodings) surfacing key versions /
algorithms / creation instants / user IDs / v4 fingerprints
(SHA-1 over 0x99‖len‖body per spec — hashlib, no crypto lib).
Secret-key material and encrypted payloads are never decoded
beyond their headers.
"""

from __future__ import annotations

import base64
import binascii
import hashlib
import re
import struct

_BEGIN_RE = re.compile(
    rb"-----BEGIN PGP ([A-Z ]+)-----\r?\n")

_ALGOS = {1: "rsa", 2: "rsa-encrypt", 3: "rsa-sign", 16: "elgamal",
          17: "dsa", 18: "ecdh", 19: "ecdsa", 22: "eddsa"}
_TAGS = {
    1: "pkesk", 2: "signature", 3: "skesk", 4: "one-pass-sig",
    5: "secret-key", 6: "public-key", 7: "secret-subkey",
    8: "compressed", 9: "encrypted", 10: "marker", 11: "literal",
    12: "trust", 13: "user-id", 14: "public-subkey",
    17: "user-attr", 18: "seipd", 19: "mdc",
}


def _crc24(data: bytes) -> int:
    crc = 0xB704CE
    for byte in data:
        crc ^= byte << 16
        for _ in range(8):
            crc <<= 1
            if crc & 0x1000000:
                crc ^= 0x1864CFB
    return crc & 0xFFFFFF


def _civil_iso(secs: int) -> str:
    days, rem = divmod(secs, 86400)
    hh, rem = divmod(rem, 3600)
    mm, ss = divmod(rem, 60)
    z = days + 719468
    era = z // 146097
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    m = mp + 3 if mp < 10 else mp - 9
    if m <= 2:
        y += 1
    return (f"{y:04d}-{m:02d}-{d:02d}T{hh:02d}:{mm:02d}:"
            f"{ss:02d}Z")


def dearmor(payload) -> dict | None:
    """armored text -> {"kind", "headers": [(k, v)], "crc_ok":
    bool|None, "data": bytes} for the FIRST armor block, or None
    when no block parses. Never raises."""
    if payload is None:
        return None
    if isinstance(payload, str):
        payload = payload.encode("utf-8", "replace")
    b = bytes(payload)
    m = _BEGIN_RE.search(b)
    if not m:
        return None
    kind = m.group(1).decode("ascii")
    end_mark = b"-----END PGP " + m.group(1) + b"-----"
    end = b.find(end_mark, m.end())
    if end < 0:
        return None
    body = b[m.end():end]
    lines = body.replace(b"\r\n", b"\n").split(b"\n")
    headers: list[tuple[str, str]] = []
    i = 0
    while i < len(lines) and lines[i].strip():
        ln = lines[i]
        if b":" not in ln:
            break
        k, _s, v = ln.partition(b": ")
        headers.append((k.decode("utf-8", "replace").strip(),
                        v.decode("utf-8", "replace").strip()))
        i += 1
    while i < len(lines) and not lines[i].strip():
        i += 1
    b64 = []
    crc_line = None
    for ln in lines[i:]:
        s = ln.strip()
        if not s:
            continue
        if s.startswith(b"="):
            crc_line = s[1:5]
            break
        b64.append(s)
    try:
        data = base64.b64decode(b"".join(b64), validate=True)
    except (binascii.Error, ValueError):
        return None
    crc_ok = None
    if crc_line is not None:
        try:
            want = int.from_bytes(
                base64.b64decode(crc_line + b"=" * (-len(crc_line) % 4)),
                "big")
            crc_ok = _crc24(data) == want
        except (binascii.Error, ValueError):
            crc_ok = False
    return {"kind": kind, "headers": headers, "crc_ok": crc_ok,
            "data": data}


def _packet_lengths(b: bytes, off: int
                    ) -> tuple[int, int, int] | None:
    """header at off -> (tag, body_off, body_len) or None."""
    if off >= len(b):
        return None
    c = b[off]
    if not c & 0x80:
        return None
    if c & 0x40:                        # new format
        tag = c & 0x3F
        p = off + 1
        if p >= len(b):
            return None
        l1 = b[p]
        if l1 < 192:
            return tag, p + 1, l1
        if l1 < 224:
            if p + 2 > len(b):
                return None
            return tag, p + 2, ((l1 - 192) << 8) + b[p + 1] + 192
        if l1 == 255:
            if p + 5 > len(b):
                return None
            (n,) = struct.unpack_from(">I", b, p + 1)
            return tag, p + 5, n
        # partial lengths: take the first chunk as the census size
        return tag, p + 1, 1 << (l1 & 0x1F)
    tag = (c >> 2) & 0x0F               # old format
    lt = c & 0x03
    p = off + 1
    if lt == 0:
        if p >= len(b):
            return None
        return tag, p + 1, b[p]
    if lt == 1:
        if p + 2 > len(b):
            return None
        return tag, p + 2, struct.unpack_from(">H", b, p)[0]
    if lt == 2:
        if p + 4 > len(b):
            return None
        return tag, p + 4, struct.unpack_from(">I", b, p)[0]
    return tag, p, len(b) - p           # indeterminate: to EOF


def parse_packets(data) -> list[dict]:
    """binary OpenPGP stream -> packet rows: {pos, tag, name,
    length, version, algorithm, created, user_id, fingerprint};
    never raises, stops at the first malformed header."""
    out: list[dict] = []
    if not isinstance(data, (bytes, bytearray)):
        return out
    b = bytes(data)
    off = 0
    while off < len(b) and len(out) < 10_000:
        hdr = _packet_lengths(b, off)
        if hdr is None:
            break
        tag, boff, blen = hdr
        blen = min(blen, len(b) - boff)
        body = b[boff:boff + blen]
        row = {"pos": len(out), "tag": tag,
               "name": _TAGS.get(tag), "length": blen,
               "version": None, "algorithm": None,
               "created": None, "user_id": None,
               "fingerprint": None}
        try:
            if tag in (5, 6, 7, 14) and len(body) >= 6:
                row["version"] = body[0]
                (created,) = struct.unpack_from(">I", body, 1)
                if 0 < created < 4102444800:
                    row["created"] = _civil_iso(created)
                row["algorithm"] = _ALGOS.get(body[5],
                                              str(body[5]))
                if body[0] == 4:
                    h = hashlib.sha1()
                    h.update(b"\x99"
                             + struct.pack(">H", len(body))
                             + body)
                    row["fingerprint"] = h.hexdigest()
            elif tag == 13:
                row["user_id"] = body.decode("utf-8", "replace")
            elif tag == 2 and len(body) >= 6:
                row["version"] = body[0]
                if body[0] == 4:
                    row["algorithm"] = _ALGOS.get(body[2],
                                                  str(body[2]))
        except (struct.error, IndexError):
            pass
        out.append(row)
        off = boff + blen
    return out


def extract_pgp(payload) -> dict | None:
    """armored OR binary payload -> {"kind", "n_headers",
    "crc_ok", "packets": [...]}; None for junk. Never raises."""
    d = dearmor(payload)
    if d is not None:
        return {"kind": d["kind"],
                "n_headers": len(d["headers"]),
                "crc_ok": d["crc_ok"],
                "packets": parse_packets(d["data"])}
    if isinstance(payload, (bytes, bytearray)) and payload and \
            payload[0] & 0x80:
        pkts = parse_packets(bytes(payload))
        if pkts and pkts[0]["name"] is not None:
            return {"kind": "BINARY", "n_headers": 0,
                    "crc_ok": None, "packets": pkts}
    return None


# --- encode half (fixtures) --------------------------------------------------

def build_key_packet(tag: int, version: int, created: int,
                     algo: int, key_material: bytes) -> bytes:
    body = bytes([version]) + struct.pack(">I", created) \
        + bytes([algo]) + key_material
    return bytes([0xC0 | tag]) + _enc_len(len(body)) + body


def _enc_len(n: int) -> bytes:
    if n < 192:
        return bytes([n])
    if n < 8384:
        n -= 192
        return bytes([192 + (n >> 8), n & 0xFF])
    return b"\xff" + struct.pack(">I", n)


def build_user_id(uid: str) -> bytes:
    raw = uid.encode("utf-8")
    return b"\xcd" + _enc_len(len(raw)) + raw


def build_old_format(tag: int, body: bytes) -> bytes:
    if len(body) < 256:
        return bytes([0x80 | (tag << 2)]) + bytes([len(body)]) \
            + body
    return bytes([0x80 | (tag << 2) | 1]) \
        + struct.pack(">H", len(body)) + body


def armor(kind: str, data: bytes,
          headers: list[tuple[str, str]] = ()) -> bytes:
    crc = _crc24(data)
    crc_b64 = base64.b64encode(
        crc.to_bytes(3, "big")).decode().rstrip("=")
    body = base64.b64encode(data).decode()
    lines = [body[i:i + 64] for i in range(0, len(body), 64)]
    hdr = "".join(f"{k}: {v}\n" for k, v in headers)
    return (f"-----BEGIN PGP {kind}-----\n{hdr}\n"
            + "\n".join(lines)
            + f"\n={crc_b64}\n-----END PGP {kind}-----\n"
            ).encode("utf-8")
