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


def _decode_image_stub(payload: bytes) -> tuple[int, int]:
    """STUB: the container ships no image codec (no PIL/cv2).

    A real deployment replaces this with PIL.Image.open(...).size.
    Here: deterministic fake dimensions derived from the payload so the
    plumbing (batching, schema, partitioning) is fully exercised.
    """
    if not payload:
        raise NotImplementedError("no codec in container; empty payload")
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
