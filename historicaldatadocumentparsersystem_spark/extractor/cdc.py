"""Content-defined chunking (FastCDC-style gear hash) — Spark-free.

Fixed-size blocks miss duplicates the moment one byte shifts the
stream; content-defined cut points resynchronize after any local
edit, so two payloads sharing a long run of bytes share the block
digests of that run regardless of where it sits. That makes
block-level dedup work on the binary columns the text dedup family
cannot touch — media payloads, PDF containers, office files — where
near-identical artifacts (re-exports, watermark variants, partial
re-crawls) dominate storage at archive scale.

Algorithm: the FastCDC scheme (Xia et al., USENIX ATC 2016) — a gear
rolling hash (h = (h << 1) + GEAR[byte], only the last 64 bytes
influence h) judged against two masks: a harder mask (more bits)
before the average-size point and an easier one after, which
normalizes the chunk-size distribution around ``avg_size``; min/max
clamp the tails. The GEAR table is derived from md5 so the whole
scheme is deterministic across processes and languages.

Like the rest of ``extractor/``, this is the correctness oracle: the
Spark operator (``operators.dedup.cdc_blocks``) calls these exact
functions per row, making Spark-vs-single-process identity
structural. Pure-Python per-byte hashing is the portability choice;
the production swap is any native FastCDC with the same GEAR/masks.
"""
from __future__ import annotations

import hashlib

_M64 = (1 << 64) - 1

GEAR = tuple(
    int.from_bytes(hashlib.md5(b"gear-%d" % i).digest()[:8], "big")
    for i in range(256))


def cdc_chunks(data: bytes, min_size: int = 2048,
               avg_size: int = 8192,
               max_size: int = 65536) -> list[tuple[int, int, str]]:
    """Cut ``data`` into content-defined chunks: [(offset, length,
    md5hex), ...] covering the payload exactly (contiguous, no gaps).

    Every chunk length is in [min_size, max_size] except the final
    remainder, which may be shorter than min_size. Empty input yields
    no chunks. Deterministic: same bytes -> same cuts -> same digests,
    on any machine.
    """
    if min_size <= 0 or not min_size <= avg_size <= max_size:
        raise ValueError("need 0 < min_size <= avg_size <= max_size")
    bits = avg_size.bit_length() - 1
    mask_hard = (1 << min(bits + 2, 63)) - 1
    mask_easy = (1 << max(bits - 2, 1)) - 1
    n = len(data)
    chunks: list[tuple[int, int, str]] = []
    start = 0
    while start < n:
        end = min(start + max_size, n)
        normal = min(start + avg_size, end)
        cut = end
        h = 0
        i = start
        while i < end:
            h = ((h << 1) + GEAR[data[i]]) & _M64
            i += 1
            if i - start < min_size:
                continue
            if (h & (mask_hard if i < normal else mask_easy)) == 0:
                cut = i
                break
        chunks.append((start, cut - start,
                       hashlib.md5(data[start:cut]).hexdigest()))
        start = cut
    return chunks
