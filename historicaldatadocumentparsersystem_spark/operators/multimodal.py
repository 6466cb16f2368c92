"""Multimodal columns: opaque binary payloads + typed metadata.

Reference analogs: image crop/encode C8 (``doc_processor.py:171-186``:
fitz 300-dpi pixmap -> PNG -> base64), image resize C14
(``utils/multimodal_RAG_methods.py:336-352``: PIL LANCZOS), magic-byte
sniff F10 (``multimodal_RAG_methods.py:313-334``), picture-class filter
F3 (``docling_chunker.py:104-126``).

The container has no image/audio codecs, so the DECODE step is stubbed
(clearly marked) while the Spark-side plumbing is real and tested:
schema (binary + struct metadata), partitioning, Arrow-batched UDF
signatures, and batch shapes are exactly what a codec-backed
implementation would use — swap ``_decode_image_stub`` for PIL/ffmpeg
and nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, IntegerType, StringType,
                               StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("payload", BinaryType(), True),
    StructField("media_kind", StringType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
])

_MAGIC = [
    (b"\xff\xd8\xff", "jpeg"),
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"RIFF", "webp_or_wav"),
    (b"ID3", "mp3"),
    (b"\x1a\x45\xdf\xa3", "webm"),
]


def sniff_media_kind_col(payload_col: str = "payload"):
    """F10 magic-byte sniff as a pure column expression (JVM-side)."""
    c = F.col(payload_col)
    expr = F.lit("unknown")
    for magic, kind in reversed(_MAGIC):
        hexs = magic.hex()
        expr = F.when(
            F.startswith(F.hex(c), F.lit(hexs.upper())), F.lit(kind)
        ).otherwise(expr)
    return expr


def make_png(width: int, height: int) -> bytes:
    """Minimal valid PNG signature + IHDR chunk (fixture support)."""
    import struct
    import zlib
    ihdr = struct.pack(">II", width, height) + b"\x08\x02\x00\x00\x00"
    chunk = b"IHDR" + ihdr
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", len(ihdr)) + chunk
            + struct.pack(">I", zlib.crc32(chunk)))


def make_gif(width: int, height: int) -> bytes:
    import struct
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00"


def make_jpeg(width: int, height: int) -> bytes:
    """SOI + a single SOF0 frame header (grayscale)."""
    import struct
    return (b"\xff\xd8\xff\xc0\x00\x0b\x08"
            + struct.pack(">HH", height, width) + b"\x01\x11\x00")


def parse_image_dimensions(payload: bytes) -> tuple[int, int] | None:
    """REAL (codec-free) dimension extraction from container headers —
    pure byte parsing, no PIL/cv2 required:

    - PNG : IHDR width/height, big-endian u32 at offsets 16/20
    - GIF : logical screen w/h, little-endian u16 at offsets 6/8
    - JPEG: scan segment markers for a SOFn frame header (C0-CF except
      C4/C8/CC), height/width big-endian u16 at +5/+7

    Returns None when the payload is not one of these containers or is
    truncated before its header fields.
    """
    import struct
    try:
        if payload.startswith(b"\x89PNG\r\n\x1a\n") and len(payload) >= 24:
            w, h = struct.unpack(">II", payload[16:24])
            return (w, h)
        if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
            w, h = struct.unpack("<HH", payload[6:10])
            return (w, h)
        if payload.startswith(b"\xff\xd8"):
            i = 2
            while i + 9 <= len(payload):
                if payload[i] != 0xFF:
                    i += 1
                    continue
                marker = payload[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seg_len = int.from_bytes(payload[i + 2:i + 4], "big")
                if (0xC0 <= marker <= 0xCF
                        and marker not in (0xC4, 0xC8, 0xCC)):
                    h, w = struct.unpack(">HH", payload[i + 5:i + 9])
                    return (w, h)
                i += 2 + seg_len
    except (struct.error, IndexError):
        return None
    return None


def _decode_image_stub(payload: bytes) -> tuple[int, int]:
    """Dimensions come from the REAL header parse when the payload is a
    recognized container; only PIXEL decode (resize/crop content) is
    stubbed — the container ships no image codec (no PIL/cv2), so a
    real deployment swaps the pixel path for PIL and nothing else
    changes."""
    if not payload:
        raise NotImplementedError("no codec in container; empty payload")
    dims = parse_image_dimensions(payload)
    if dims is not None:
        return dims
    # unrecognized container: deterministic fake keeps plumbing testable
    h = int.from_bytes(payload[:4].ljust(4, b"\0"), "big")
    return (64 + h % 1920, 64 + (h >> 8) % 1080)


def decode_media_batch(batches: Iterator[pd.DataFrame]
                       ) -> Iterator[pd.DataFrame]:
    """mapInPandas body: binary payloads -> metadata rows.

    Batch shape: one Arrow batch of (media_id, payload) in, same-length
    batch of MEDIA_SCHEMA out. Exactly the signature a codec-backed
    decode/resize/frame-sample UDF uses.
    """
    for b in batches:
        kinds, ws, hs = [], [], []
        for payload in b["payload"]:
            payload = bytes(payload) if payload is not None else b""
            kind = "unknown"
            for magic, k in _MAGIC:
                if payload.startswith(magic):
                    kind = k
                    break
            try:
                w, h = _decode_image_stub(payload)
            except NotImplementedError:
                w, h = None, None
            kinds.append(kind)
            ws.append(w)
            hs.append(h)
        yield pd.DataFrame({
            "media_id": b["media_id"],
            "payload": b["payload"],
            "media_kind": kinds,
            "width": pd.array(ws, dtype="Int32"),
            "height": pd.array(hs, dtype="Int32"),
        })


def decode_media(df: DataFrame) -> DataFrame:
    """(media_id, payload) -> MEDIA_SCHEMA rows, Arrow-batched."""
    return df.select("media_id", "payload") \
        .mapInPandas(decode_media_batch, MEDIA_SCHEMA)


def filter_allowed_classes(df: DataFrame, classes_col: str,
                           allowed: list[str],
                           conf_prefix: float = 0.8) -> DataFrame:
    """F3 semantics (``docling_chunker.py:104-126``): keep a row iff the
    cumulative-confidence<=prefix of its predicted classes (sorted desc
    by confidence) contains an allowed class name.

    classes_col: ARRAY<STRUCT<name:string, conf:double>>.
    """
    sorted_desc = F.reverse(F.array_sort(
        F.transform(F.col(classes_col),
                    lambda s: F.struct(s.getField("conf").alias("conf"),
                                       s.getField("name").alias("name")))))
    # running cumulative confidence via aggregate into (cum, keep)
    acc0 = F.struct(F.lit(0.0).alias("cum"), F.lit(False).alias("keep"))
    folded = F.aggregate(
        sorted_desc, acc0,
        lambda acc, s: F.struct(
            (acc.getField("cum") + s.getField("conf")).alias("cum"),
            (acc.getField("keep")
             | ((acc.getField("cum") <= conf_prefix)
                & s.getField("name").isin(*allowed))).alias("keep")))
    return df.where(folded.getField("keep"))
