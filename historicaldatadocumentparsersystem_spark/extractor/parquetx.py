"""Parquet footer reader — from-scratch Thrift compact protocol,
pure Python, Spark-free.

The engine's own at-rest format, read WITHOUT any parquet library:
the footer (``PAR1`` magic + length-prefixed Thrift-compact
``FileMetaData``) describes row groups, column chunks, codecs and
byte sizes — the exact inputs a 100 TB table-layout audit needs
(row-group size vs ``spark.sql.files.maxPartitionBytes``, codec
census, oversized-chunk detection) while reading ONLY the last few
KB of each file, never the data pages.

Thrift compact protocol subset (the full value grammar, generically
decoded so unknown/new fields skip cleanly):
- field header ``(delta << 4) | type``; delta 0 -> explicit zigzag
  field id; types: bool-true/false, i8, i16/i32/i64 (zigzag
  varints), double (8B LE), binary (varint length), list/set
  (``(size << 4) | elem`` with size 15 -> varint), map, struct;
- structs decode to ``{field_id: value}`` dicts; the parquet
  interpretation layer picks the documented FileMetaData ids
  (parquet-format thrift: schema=2, num_rows=3, row_groups=4,
  created_by=6; ColumnMetaData type=1, encodings=2, path=3,
  codec=4, ...).

The oracle for this module is DuckDB's native ``parquet_metadata``
— a TRUE dual-engine check of the whole wire format.
"""

from __future__ import annotations

import struct as _struct

TYPE_NAMES = {0: "BOOLEAN", 1: "INT32", 2: "INT64", 3: "INT96",
              4: "FLOAT", 5: "DOUBLE", 6: "BYTE_ARRAY",
              7: "FIXED_LEN_BYTE_ARRAY"}

CODEC_NAMES = {0: "UNCOMPRESSED", 1: "SNAPPY", 2: "GZIP", 3: "LZO",
               4: "BROTLI", 5: "LZ4", 6: "ZSTD", 7: "LZ4_RAW"}

ENCODING_NAMES = {0: "PLAIN", 2: "PLAIN_DICTIONARY", 3: "RLE",
                  4: "BIT_PACKED", 5: "DELTA_BINARY_PACKED",
                  6: "DELTA_LENGTH_BYTE_ARRAY",
                  7: "DELTA_BYTE_ARRAY", 8: "RLE_DICTIONARY",
                  9: "BYTE_STREAM_SPLIT"}


class ThriftError(ValueError):
    pass


def _varint(buf: bytes, off: int):
    out = shift = 0
    while True:
        if off >= len(buf) or shift > 63:
            raise ThriftError("truncated varint")
        b = buf[off]
        out |= (b & 0x7F) << shift
        off += 1
        if not b & 0x80:
            return out, off
        shift += 7


def _zigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _read_value(buf: bytes, off: int, vtype: int):
    if vtype in (1, 2):                      # bool inside containers
        if off >= len(buf):
            raise ThriftError("truncated bool")
        return buf[off] == 1, off + 1
    if vtype == 3:                           # i8
        if off >= len(buf):
            raise ThriftError("truncated byte")
        return _zigzag(buf[off]), off + 1
    if vtype in (4, 5, 6):                   # i16/i32/i64
        n, off = _varint(buf, off)
        return _zigzag(n), off
    if vtype == 7:                           # double
        if off + 8 > len(buf):
            raise ThriftError("truncated double")
        return _struct.unpack_from("<d", buf, off)[0], off + 8
    if vtype == 8:                           # binary
        n, off = _varint(buf, off)
        if n < 0 or off + n > len(buf):
            raise ThriftError("binary overruns buffer")
        return buf[off:off + n], off + n
    if vtype in (9, 10):                     # list / set
        if off >= len(buf):
            raise ThriftError("truncated list header")
        head = buf[off]
        off += 1
        size = head >> 4
        elem = head & 0x0F
        if size == 15:
            size, off = _varint(buf, off)
        if size > len(buf):
            raise ThriftError("absurd list size")
        out = []
        for _ in range(size):
            v, off = _read_value(buf, off, elem)
            out.append(v)
        return out, off
    if vtype == 11:                          # map
        size, off = _varint(buf, off)
        if size > len(buf):
            raise ThriftError("absurd map size")
        if size == 0:
            return {}, off
        if off >= len(buf):
            raise ThriftError("truncated map header")
        kv = buf[off]
        off += 1
        ktype, vtype2 = kv >> 4, kv & 0x0F
        out = {}
        for _ in range(size):
            k, off = _read_value(buf, off, ktype)
            v, off = _read_value(buf, off, vtype2)
            out[k if not isinstance(k, bytes) else bytes(k)] = v
        return out, off
    if vtype == 12:                          # struct
        return _read_struct(buf, off)
    raise ThriftError(f"unknown compact type {vtype}")


def _read_struct(buf: bytes, off: int):
    fields: dict[int, object] = {}
    last_id = 0
    while True:
        if off >= len(buf):
            raise ThriftError("truncated struct")
        head = buf[off]
        off += 1
        if head == 0:                        # STOP
            return fields, off
        ftype = head & 0x0F
        delta = head >> 4
        if delta:
            fid = last_id + delta
        else:
            n, off = _varint(buf, off)
            fid = _zigzag(n)
        last_id = fid
        if ftype == 1:
            fields[fid] = True
        elif ftype == 2:
            fields[fid] = False
        else:
            fields[fid], off = _read_value(buf, off, ftype)
        if len(fields) > 10000:
            raise ThriftError("absurd struct")


def _txt(v):
    return v.decode("utf-8", "replace") if isinstance(v, bytes) \
        else None


def parse_footer(payload) -> dict | None:
    """Whole-file (or tail) bytes -> {created_by, version,
    num_rows, schema: [...], chunks: [...]} or None when the
    payload is not a parquet file. Never raises."""
    if payload is None:
        return None
    buf = bytes(payload)
    if len(buf) < 12 or buf[-4:] != b"PAR1":
        return None
    meta_len = int.from_bytes(buf[-8:-4], "little")
    if meta_len <= 0 or meta_len > len(buf) - 8:
        return None
    meta = buf[-8 - meta_len:-8]
    try:
        fmd, _ = _read_struct(meta, 0)
    except (ThriftError, ValueError):
        return None
    schema = []
    for el in fmd.get(2) or []:
        if not isinstance(el, dict):
            continue
        schema.append({
            "name": _txt(el.get(4)),
            "type": TYPE_NAMES.get(el.get(1)),
            "num_children": el.get(5),
            "repetition": el.get(3),
        })
    chunks = []
    for rg_id, rg in enumerate(fmd.get(4) or []):
        if not isinstance(rg, dict):
            continue
        for col_id, cc in enumerate(rg.get(1) or []):
            if not isinstance(cc, dict):
                continue
            md = cc.get(3)
            md = md if isinstance(md, dict) else {}
            path = [_txt(p) for p in (md.get(3) or [])
                    if isinstance(p, bytes)]
            encs = [ENCODING_NAMES.get(e, str(e))
                    for e in (md.get(2) or [])
                    if isinstance(e, int)]
            chunks.append({
                "row_group_id": rg_id,
                "row_group_num_rows": rg.get(3),
                "row_group_bytes": rg.get(2),
                "column_id": col_id,
                "file_offset": cc.get(2),
                "num_values": md.get(5),
                "path_in_schema": ", ".join(path),
                "type": TYPE_NAMES.get(md.get(1)),
                "compression": CODEC_NAMES.get(md.get(4)),
                "encodings": ", ".join(encs),
                "index_page_offset": md.get(10),
                "dictionary_page_offset": md.get(11),
                "data_page_offset": md.get(9),
                "total_compressed_size": md.get(7),
                "total_uncompressed_size": md.get(6),
            })
    return {
        "version": fmd.get(1),
        "num_rows": fmd.get(3),
        "created_by": _txt(fmd.get(6)),
        "schema": schema,
        "chunks": chunks,
    }
