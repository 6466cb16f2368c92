"""Baseline JPEG codec — pure stdlib, from scratch (no PIL/libjpeg).

Scope: baseline sequential DCT (SOF0), Huffman entropy coding, 8-bit
samples, grayscale or 4:4:4 YCbCr color, optional restart markers on
decode. The encoder exists to produce REAL test inputs (standard
Annex-K quantization + Huffman tables, the public JPEG spec
constants); the decoder is the production path behind
``operators/multimodal.image_pixel_stats``. Progressive scans,
arithmetic coding, and chroma subsampling raise ValueError and fall
back to the header-only dimension parse.

Like the rest of ``extractor/``, this file is Spark-free on purpose:
it IS the correctness oracle and the Arrow UDFs call these exact
functions. Reference analog: the C8/C14 image pipeline
(``doc_processor.py:171-186``, ``multimodal_RAG_methods.py:336-352``)
which delegates to fitz/PIL.

JPEG is lossy: round-trip tests assert exact dimensions plus bounded
per-pixel error (quantization noise), and smooth images reconstruct
within a few levels.
"""

from __future__ import annotations

import math
import struct

# --- spec constants (JPEG Annex K, public standard) --------------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]

QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99]

QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99]

# (BITS counts of codes per length 1..16, HUFFVAL symbol list)
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# 1-D DCT-II basis: C[u][x] = a(u) * cos((2x+1) u pi / 16)
_DCT = [[(math.sqrt(1 / 8) if u == 0 else math.sqrt(2 / 8))
         * math.cos((2 * x + 1) * u * math.pi / 16)
         for x in range(8)] for u in range(8)]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict:
    """(BITS, HUFFVAL) -> {symbol: (code, length)} canonical codes."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict:
    """(BITS, HUFFVAL) -> {(length, code): symbol} for bitwise decode."""
    return {(ln, c): s for s, (c, ln) in
            _canonical_codes(bits, vals).items()}


def _fdct2(block: list[float]) -> list[float]:
    """8x8 forward DCT-II (separable, orthonormal)."""
    tmp = [0.0] * 64
    for y in range(8):                      # rows
        for u in range(8):
            tmp[y * 8 + u] = sum(block[y * 8 + x] * _DCT[u][x]
                                 for x in range(8))
    out = [0.0] * 64
    for u in range(8):                      # columns
        for v in range(8):
            out[v * 8 + u] = sum(tmp[y * 8 + u] * _DCT[v][y]
                                 for y in range(8))
    return out


def _idct2(coef: list[float]) -> list[float]:
    """8x8 inverse DCT (transpose of the forward)."""
    tmp = [0.0] * 64
    for v in range(8):
        for x in range(8):
            tmp[v * 8 + x] = sum(coef[v * 8 + u] * _DCT[u][x]
                                 for u in range(8))
    out = [0.0] * 64
    for x in range(8):
        for y in range(8):
            out[y * 8 + x] = sum(tmp[v * 8 + x] * _DCT[v][y]
                                 for v in range(8))
    return out


# --- bit IO -------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)       # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad 1s
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated entropy stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated after 0xFF")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1               # stuffed byte
            elif 0xD0 <= nxt <= 0xD7:       # restart marker
                raise _Restart()
            else:
                raise ValueError(f"marker 0xFF{nxt:02X} in stream")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self) -> None:
        """Skip to just after the next RSTn marker, resetting state."""
        self.acc = self.n = 0
        while self.pos + 1 < len(self.data):
            if (self.data[self.pos] == 0xFF
                    and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("missing restart marker")


class _Restart(Exception):
    pass


def _huff_decode(r: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | r.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _receive_extend(r: _BitReader, s: int) -> int:
    if s == 0:
        return 0
    v = r.bits(s)
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# --- encoder ------------------------------------------------------------------

def _encode_block(samples: list[int], quant: list[int], dc_codes: dict,
                  ac_codes: dict, pred: int, w: _BitWriter) -> int:
    coef = _fdct2([s - 128.0 for s in samples])
    q = [int(round(coef[ZIGZAG[i]] / quant[i])) for i in range(64)]
    diff = q[0] - pred
    s = diff.bit_length() if diff > 0 else (-diff).bit_length()
    code, ln = dc_codes[s]
    w.write(code, ln)
    if s:
        w.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    for i in range(1, 64):
        v = q[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]       # ZRL
            w.write(code, ln)
            run -= 16
        s = v.bit_length() if v > 0 else (-v).bit_length()
        code, ln = ac_codes[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, ln = ac_codes[0x00]           # EOB
        w.write(code, ln)
    return q[0]


def _block_at(plane: list[int], w: int, h: int,
              ox: int, oy: int) -> list[int]:
    """8x8 block at pixel offset (ox, oy), edge-replicated."""
    block = []
    for y in range(8):
        sy = min(oy + y, h - 1)
        for x in range(8):
            block.append(plane[sy * w + min(ox + x, w - 1)])
    return block


def _downsample2(plane: list[int], w: int, h: int) -> list[int]:
    """2x2 box average (rounded) — chroma subsampling for 4:2:0."""
    cw, ch = (w + 1) // 2, (h + 1) // 2
    out = [0] * (cw * ch)
    for y in range(ch):
        for x in range(cw):
            acc, n = 0, 0
            for dy in (0, 1):
                for dx in (0, 1):
                    sy, sx = 2 * y + dy, 2 * x + dx
                    if sy < h and sx < w:
                        acc += plane[sy * w + sx]
                        n += 1
            out[y * cw + x] = (acc + n // 2) // n
    return out


def _rgb_to_ycbcr(pixels: bytes, n: int):
    ys, cbs, crs = [], [], []
    for i in range(n):
        r, g, b = pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
        ys.append(min(255, max(0, round(
            0.299 * r + 0.587 * g + 0.114 * b))))
        cbs.append(min(255, max(0, round(
            128 - 0.168736 * r - 0.331264 * g + 0.5 * b))))
        crs.append(min(255, max(0, round(
            128 + 0.5 * r - 0.418688 * g - 0.081312 * b))))
    return ys, cbs, crs


def encode_jpeg(pixels: bytes, width: int, height: int,
                channels: int = 3, subsample: bool = False) -> bytes:
    """Baseline JFIF encoder: grayscale (1) or YCbCr (3) at 4:4:4, or
    4:2:0 with ``subsample=True`` (2x2-box-averaged chroma — the
    dominant real-world layout); standard Annex-K quantization and
    Huffman tables."""
    if channels == 3:
        planes = list(_rgb_to_ycbcr(pixels, width * height))
    elif channels == 1:
        planes = [list(pixels)]
        subsample = False
    else:
        raise ValueError("channels must be 1 or 3")
    factors = [(1, 1)] * channels
    dims = [(width, height)] * channels
    if subsample:
        factors = [(2, 2), (1, 1), (1, 1)]
        cw, ch2 = (width + 1) // 2, (height + 1) // 2
        planes = [planes[0],
                  _downsample2(planes[1], width, height),
                  _downsample2(planes[2], width, height)]
        dims = [(width, height), (cw, ch2), (cw, ch2)]
    out = bytearray(b"\xff\xd8")            # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, qt in ((0, QUANT_LUMA),) + (
            ((1, QUANT_CHROMA),) if channels == 3 else ()):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        # quant tables are stored in ZIGZAG order per spec
        out += bytes(qt[ZIGZAG[i]] for i in range(64))
    sof = bytes([8]) + struct.pack(">HH", height, width) \
        + bytes([channels])
    for ci in range(channels):
        h_i, v_i = factors[ci]
        sof += bytes([ci + 1, (h_i << 4) | v_i, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    tables = [(0x00, DC_LUMA), (0x10, AC_LUMA)] + (
        [(0x01, DC_CHROMA), (0x11, AC_CHROMA)] if channels == 3 else [])
    for tclass, (bits, vals) in tables:
        body = bytes([tclass]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    sos = bytes([channels])
    for ci in range(channels):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    dc_l = _canonical_codes(*DC_LUMA)
    ac_l = _canonical_codes(*AC_LUMA)
    dc_c = _canonical_codes(*DC_CHROMA)
    ac_c = _canonical_codes(*AC_CHROMA)
    wtr = _BitWriter()
    preds = [0] * channels
    # zigzag-ordered quant tables for coefficient quantization
    qz_l = [QUANT_LUMA[ZIGZAG[i]] for i in range(64)]
    qz_c = [QUANT_CHROMA[ZIGZAG[i]] for i in range(64)]
    hmax = max(h for h, _ in factors)
    vmax = max(v for _, v in factors)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(channels):
                h_i, v_i = factors[ci]
                pw, ph = dims[ci]
                for by in range(v_i):
                    for bx in range(h_i):
                        block = _block_at(planes[ci], pw, ph,
                                          (mx * h_i + bx) * 8,
                                          (my * v_i + by) * 8)
                        if ci == 0:
                            preds[ci] = _encode_block(
                                block, qz_l, dc_l, ac_l, preds[ci], wtr)
                        else:
                            preds[ci] = _encode_block(
                                block, qz_c, dc_c, ac_c, preds[ci], wtr)
    out += wtr.flush()
    out += b"\xff\xd9"                      # EOI
    return bytes(out)


# --- decoder ------------------------------------------------------------------

def _decode_block(r: _BitReader, huff, dc_t: int, ac_t: int,
                  qt: list[int], preds: list[int], ci: int) -> list[float]:
    coefz = [0] * 64
    s = _huff_decode(r, huff[0x00 | dc_t])
    preds[ci] += _receive_extend(r, s)
    coefz[0] = preds[ci] * qt[0]
    k = 1
    while k < 64:
        rs = _huff_decode(r, huff[0x10 | ac_t])
        rr, s = rs >> 4, rs & 0x0F
        if s == 0:
            if rr == 15:
                k += 16
                continue
            break                           # EOB
        k += rr
        if k > 63:
            raise ValueError("AC index overflow")
        coefz[k] = _receive_extend(r, s) * qt[k]
        k += 1
    coef = [0.0] * 64
    for i in range(64):
        coef[ZIGZAG[i]] = float(coefz[i])
    return _idct2(coef)


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, pixels) for baseline sequential JPEG:
    grayscale, 4:4:4, or subsampled chroma (any h/v factors up to 2,
    incl. the dominant real-world 4:2:0). Progressive or arithmetic
    streams raise ValueError (callers fall back to header dims)."""
    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG")
    pos = 2
    quant: dict[int, list[int]] = {}
    huff: dict[int, dict] = {}
    comps: list[tuple[int, int, int, int]] = []  # (id, h, v, quant id)
    scan: list[tuple[int, int, int]] = []   # (comp idx, dc tid, ac tid)
    width = height = 0
    restart_interval = 0
    data = b""
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        body = payload[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:                   # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                quant[tq] = list(body[i + 1:i + 65])
                i += 65
        elif marker == 0xC4:                 # DHT
            i = 0
            while i < len(body):
                tc_th = body[i]
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                huff[tc_th] = _decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xC0:                 # SOF0 baseline
            height, width = struct.unpack(">HH", body[1:5])
            nc = body[5]
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c:9 + 3 * c]
                h_i, v_i = samp >> 4, samp & 0x0F
                if not (1 <= h_i <= 2 and 1 <= v_i <= 2):
                    raise ValueError("sampling factors > 2 unsupported")
                comps.append((cid, h_i, v_i, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == 0xDD:                 # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:                 # SOS
            ns = body[0]
            for c in range(ns):
                cs, tids = body[1 + 2 * c], body[2 + 2 * c]
                idx = next(i for i, (cid, _, _, _) in enumerate(comps)
                           if cid == cs)
                scan.append((idx, tids >> 4, tids & 0x0F))
            data = payload[pos + 2 + seglen:]
            break
        pos += 2 + seglen
    if not comps or not scan or not data:
        raise ValueError("missing SOF/SOS")
    nch = len(comps)
    if nch not in (1, 3):
        # 2-component scans and 4-component (Adobe CMYK) streams are not
        # supported by the grayscale/YCbCr paths; raise ValueError BEFORE
        # the full entropy decode so callers take the documented
        # header-dims fallback instead of IndexError / silently-wrong RGB.
        raise ValueError(f"unsupported component count {nch}")
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
    strides = [mcus_x * h * 8 for _, h, _, _ in comps]
    planes = [[0] * (strides[i] * mcus_y * comps[i][2] * 8)
              for i in range(nch)]
    r = _BitReader(data)
    preds = [0] * nch
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                r.sync_restart()
                preds = [0] * nch
            mcu += 1
            for (ci, dc_t, ac_t) in scan:
                _, h_i, v_i, tq = comps[ci]
                qt = quant[tq]
                for by in range(v_i):
                    for bx in range(h_i):
                        try:
                            px = _decode_block(r, huff, dc_t, ac_t, qt,
                                               preds, ci)
                        except _Restart:
                            raise ValueError("unexpected restart marker")
                        plane, stride = planes[ci], strides[ci]
                        ox = (mx * h_i + bx) * 8
                        oy = (my * v_i + by) * 8
                        for y in range(8):
                            row = (oy + y) * stride + ox
                            for x in range(8):
                                v = int(round(px[y * 8 + x] + 128.0))
                                plane[row + x] = 0 if v < 0 else (
                                    255 if v > 255 else v)
    if nch == 1:
        stride = strides[0]
        out = bytearray(width * height)
        for y in range(height):
            out[y * width:(y + 1) * width] = bytes(
                planes[0][y * stride:y * stride + width])
        return width, height, 1, bytes(out)
    out = bytearray(width * height * 3)
    for y in range(height):
        for x in range(width):
            # sample each plane at its subsampled coordinate
            vals = []
            for i in range(nch):
                _, h_i, v_i, _ = comps[i]
                sx, sy = x * h_i // hmax, y * v_i // vmax
                vals.append(planes[i][sy * strides[i] + sx])
            Y, cb, cr = vals[0], vals[1] - 128, vals[2] - 128
            d = (y * width + x) * 3
            for j, v in enumerate((Y + 1.402 * cr,
                                   Y - 0.344136 * cb - 0.714136 * cr,
                                   Y + 1.772 * cb)):
                iv = int(round(v))
                out[d + j] = 0 if iv < 0 else (255 if iv > 255 else iv)
    return width, height, 3, bytes(out)
