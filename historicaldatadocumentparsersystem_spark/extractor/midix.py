"""Standard MIDI File reader — pure Python over the published SMF
spec (MIDI 1.0 / RP-001), Spark-free.

The symbolic-music modality (archives carry decades of .mid):
header chunk (format, track count, division incl. the SMPTE
high-bit form), then per-track event walks with RUNNING STATUS
(the rule naive parsers break on), VLQ delta times, meta events
(track name, tempo as exact integer µs-per-quarter, time
signature, end-of-track), sysex skipping, and channel-message
data widths (Cx/Dx take ONE data byte, the others two). Census
only — no synthesis: per-track note counts, name, tick length;
file-level first tempo and integer bpm via 60_000_000 div tempo.
"""

from __future__ import annotations

import struct


def _vlq(b: bytes, off: int) -> tuple[int, int]:
    v = 0
    for _ in range(4):
        if off >= len(b):
            raise ValueError("vlq overrun")
        c = b[off]
        off += 1
        v = (v << 7) | (c & 0x7F)
        if not c & 0x80:
            return v, off
    raise ValueError("vlq too long")


def parse_midi(payload) -> dict | None:
    """midi bytes -> {"format", "n_tracks_declared", "division",
    "smpte", "tempo_us", "bpm", "time_sig", "tracks": [(pos, name,
    n_events, n_notes, ticks)]} or None for junk. Never raises."""
    if not isinstance(payload, (bytes, bytearray)) or \
            len(payload) < 14 or bytes(payload[:4]) != b"MThd":
        return None
    b = bytes(payload)
    try:
        (hlen, fmt, ntrks, division) = struct.unpack_from(
            ">IHHH", b, 4)
        if hlen < 6 or fmt > 2:
            return None
        smpte = bool(division & 0x8000)
        out: dict = {"format": fmt, "n_tracks_declared": ntrks,
                     "division": division & 0x7FFF if smpte
                     else division,
                     "smpte": smpte, "tempo_us": None,
                     "bpm": None, "time_sig": None, "tracks": []}
        off = 8 + hlen
        for _t in range(min(ntrks, 256)):
            if off + 8 > len(b):
                break
            if b[off:off + 4] != b"MTrk":
                break
            (tlen,) = struct.unpack_from(">I", b, off + 4)
            start = off + 8
            end = min(start + tlen, len(b))
            p = start
            running = None
            n_events = n_notes = 0
            ticks = 0
            name = None
            while p < end:
                delta, p = _vlq(b, p)
                ticks += delta
                if p >= end:
                    break
                c = b[p]
                if c == 0xFF:               # meta
                    if p + 2 > end:
                        break
                    mtype = b[p + 1]
                    mlen, q = _vlq(b, p + 2)
                    data = b[q:q + mlen]
                    p = q + mlen
                    n_events += 1
                    if mtype == 0x03 and name is None:
                        name = data.decode("latin-1")
                    elif mtype == 0x51 and mlen == 3 and \
                            out["tempo_us"] is None:
                        tempo = int.from_bytes(data, "big")
                        if tempo > 0:
                            out["tempo_us"] = tempo
                            out["bpm"] = 60_000_000 // tempo
                    elif mtype == 0x58 and mlen >= 2 and \
                            out["time_sig"] is None:
                        out["time_sig"] = \
                            f"{data[0]}/{1 << data[1]}"
                    elif mtype == 0x2F:
                        break
                    running = None
                elif c in (0xF0, 0xF7):     # sysex
                    slen, q = _vlq(b, p + 1)
                    p = q + slen
                    n_events += 1
                    running = None
                else:
                    if c & 0x80:
                        status = c
                        p += 1
                        running = status
                    elif running is not None:
                        status = running
                    else:
                        break               # garbage data byte
                    hi = status >> 4
                    width = 1 if hi in (0xC, 0xD) else 2
                    if p + width > end:
                        break
                    if hi == 0x9 and b[p + 1] > 0:
                        n_notes += 1        # velocity-0 = note off
                    p += width
                    n_events += 1
            out["tracks"].append((len(out["tracks"]), name,
                                  n_events, n_notes, ticks))
            off = start + tlen
        return out
    except (struct.error, ValueError, IndexError):
        return None


# --- encode half (fixtures) --------------------------------------------------

def _enc_vlq(v: int) -> bytes:
    out = [v & 0x7F]
    v >>= 7
    while v:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    return bytes(reversed(out))


def build_midi(tracks: list[list[tuple]], fmt: int = 1,
               division: int = 480) -> bytes:
    """tracks = [[(delta, event_bytes | ('meta', type, data))]];
    EndOfTrack appended per track."""
    blobs = []
    for evs in tracks:
        body = b""
        for delta, ev in evs:
            body += _enc_vlq(delta)
            if isinstance(ev, tuple) and ev[0] == "meta":
                _m, mtype, data = ev
                body += bytes([0xFF, mtype]) \
                    + _enc_vlq(len(data)) + data
            else:
                body += ev
        body += b"\x00\xff\x2f\x00"
        blobs.append(b"MTrk" + struct.pack(">I", len(body))
                     + body)
    return (b"MThd" + struct.pack(">IHHH", 6, fmt, len(blobs),
                                  division)
            + b"".join(blobs))
