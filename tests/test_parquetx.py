"""From-scratch parquet footer reader: thrift vectors, whole-
fixture-corpus parity vs DuckDB's native reader, fuzz."""

import glob
import random

import duckdb

from historicaldatadocumentparsersystem_spark.extractor import \
    parquetx

DUCK_COLS = ("row_group_id, row_group_num_rows, column_id, "
             "file_offset, num_values, path_in_schema, type, "
             "compression, encodings, data_page_offset, "
             "dictionary_page_offset, total_compressed_size, "
             "total_uncompressed_size")

KEYS = [c.strip() for c in DUCK_COLS.split(",")]


def test_thrift_primitives():
    # varint / zigzag round trip through a hand-built struct:
    # field 1 (i32) = -3, field 2 (binary) = b"ab",
    # field 3 (list<i64>) = [300], then STOP
    buf = bytes([0x15, 0x05,              # delta1, i32, zz(-3)=5
                 0x18, 0x02]) + b"ab" + \
        bytes([0x19, 0x16, 0xD8, 0x04,    # list size1 elem=i64 zz600
               0x00])
    fields, off = parquetx._read_struct(buf, 0)
    assert fields == {1: -3, 2: b"ab", 3: [300]}
    assert off == len(buf)
    # bool fields encode in the type nibble
    fields, _ = parquetx._read_struct(bytes([0x11, 0x12, 0x00]), 0)
    assert fields == {1: True, 2: False}
    # truncation raises ThriftError (a ValueError)
    for cut in range(1, len(buf) - 1):
        try:
            parquetx._read_struct(buf[:cut], 0)
        except ValueError:
            pass


def test_every_committed_fixture_matches_duckdb():
    files = sorted(glob.glob("fixtures/*.parquet"))
    assert len(files) > 50
    con = duckdb.connect()
    for p in files:
        with open(p, "rb") as fh:
            d = parquetx.parse_footer(fh.read())
        assert d is not None, p
        mine = [tuple(c[k] for k in KEYS) for c in d["chunks"]]
        duck = [tuple(r) for r in con.execute(
            f"SELECT {DUCK_COLS} FROM parquet_metadata('{p}')"
        ).fetchall()]
        assert mine == duck, p
        n_rows = con.execute(
            f"SELECT num_rows FROM parquet_file_metadata('{p}')"
        ).fetchone()[0]
        assert d["num_rows"] == n_rows, p


def test_rejects_and_fuzz():
    assert parquetx.parse_footer(b"") is None
    assert parquetx.parse_footer(None) is None
    assert parquetx.parse_footer(b"PAR1") is None
    assert parquetx.parse_footer(b"x" * 100 + b"PAR1") is None
    with open(glob.glob("fixtures/*.parquet")[0], "rb") as fh:
        base = fh.read()
    rng = random.Random(13)
    for _ in range(150):
        blob = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(0, 64)))
        parquetx.parse_footer(blob + b"PAR1")
    for _ in range(200):       # bit flips inside the real footer
        mut = bytearray(base)
        i = rng.randrange(max(0, len(mut) - 4000), len(mut) - 8)
        mut[i] ^= 1 << rng.randrange(8)
        parquetx.parse_footer(bytes(mut))
    for i in range(0, 200, 7):  # truncated tails
        parquetx.parse_footer(base[:-i or None])
