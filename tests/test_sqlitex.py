"""SQLite family: varint/header vectors, stdlib-sqlite3 parity on
fresh builds, committed-golden pin, Spark parity, corruption fuzz."""

import random
import sqlite3

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import \
    sqlitex

GOLDEN = "fixtures/golden_sqlite_seed42_n10.parquet"
COLS = ["pos", "otype", "name", "tbl_name", "rootpage", "n_rows",
        "sql_chars", "page_size", "encoding", "n_pages",
        "freelist_pages"]


def test_varint_vectors():
    assert sqlitex._varint(b"\x00", 0) == (0, 1)
    assert sqlitex._varint(b"\x7f", 0) == (127, 1)
    assert sqlitex._varint(b"\x81\x00", 0) == (128, 2)
    assert sqlitex._varint(b"\x82\x2c", 0) == (300, 2)
    # 9-byte varint: the last byte contributes all 8 bits
    assert sqlitex._varint(b"\xff" * 8 + b"\xff", 0) == \
        ((1 << 64) - 1 & 0xFFFFFFFFFFFFFFFF, 9)


def test_header_rejects_junk():
    assert sqlitex.parse_header(b"not sqlite") is None
    assert sqlitex.parse_header(None) is None
    # bad page size (not a power of two) rejected
    bad = bytearray(sqlitex._MAGIC + b"\x00" * 84)
    bad[16:18] = (600).to_bytes(2, "big")
    assert sqlitex.parse_header(bytes(bad)) is None
    for r in fixtures.sqlite_db_rows():
        name = r["url"].rsplit("/", 1)[1]
        h = sqlitex.parse_header(r["payload"])
        assert (h is None) == (name in ("junk.bin", "trunc.db"))


def _stdlib_parity(rows):
    """Both engines read the SAME bytes — version-independent."""
    for r in rows:
        d = sqlitex.parse_sqlite(r["payload"])
        if d["header"] is None:
            continue
        con = sqlite3.connect(":memory:")
        con.deserialize(r["payload"])
        exp = con.execute(
            "SELECT type, name, tbl_name, rootpage, sql "
            "FROM sqlite_master").fetchall()
        got = [(o[1], o[2], o[3], o[4], o[5]) for o in d["objects"]]
        assert got == [tuple(e) for e in exp], r["url"]
        for o in d["objects"]:
            if o[1] == "table":
                n = con.execute(
                    f'SELECT count(*) FROM "{o[2]}"').fetchone()[0]
                assert o[6] == n, (r["url"], o[2])
            else:
                assert o[6] is None
        con.close()


def test_stdlib_parity_committed():
    _stdlib_parity(fixtures.sqlite_db_rows())


def test_stdlib_parity_fresh_build():
    # rebuilt with the LOCAL sqlite — catches page-image layouts the
    # committed corpus (built by one specific version) can't
    _stdlib_parity(fixtures.build_sqlite_fixture_dbs())


def test_shapes_covered():
    """The corpus actually exercises the hard paths."""
    by = {}
    for r in fixtures.sqlite_db_rows():
        name = r["url"].rsplit("/", 1)[1]
        by[name] = sqlitex.parse_sqlite(r["payload"])
    # deep: multi-level rowid b-tree at page_size 512
    h = by["deep.db"]["header"]
    assert h["page_size"] == 512 and h["n_pages"] > 30
    assert by["deep.db"]["objects"][0][6] == 3000
    # overflow: the CREATE sql spills to overflow pages
    wide = by["overflow.db"]["objects"][0]
    assert wide[5] is not None and len(wide[5]) > 512
    # utf16le text decoding
    assert by["utf16.db"]["header"]["encoding"] == "utf16le"
    assert by["utf16.db"]["objects"][0][2] == "articles"
    # WITHOUT ROWID: index-tree root, rows in interior + leaf cells
    assert by["worowid.db"]["objects"][0][6] == 400
    # freelist pages reported from the header
    assert by["freelist.db"]["header"]["freelist_pages"] > 0
    # catalog-empty database still yields a header
    assert by["empty.db"]["header"] is not None
    assert by["empty.db"]["objects"] == []


def _pure() -> list[tuple]:
    out = []
    for r in fixtures.sqlite_db_rows():
        d = sqlitex.parse_sqlite(r["payload"])
        h = d["header"]
        if h is None:
            continue
        for (pos, otype, name, tbl, root, sql, n_rows) in \
                d["objects"]:
            out.append((r["url"], pos, otype, name, tbl, root,
                        n_rows,
                        len(sql) if sql is not None else None,
                        h["page_size"], h["encoding"],
                        h["n_pages"], h["freelist_pages"]))
    return out


def test_match_committed_golden():
    got = [(r["url"],) + tuple(r[c] for c in COLS)
           for r in pq.read_table(GOLDEN).to_pylist()]
    assert got == _pure() and len(got) == 12


def test_spark_reader_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    df = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.sqlite_db_rows()],
        "url string, payload binary").repartition(8)
    got = sorted(tuple(r) for r in
                 sources.read_sqlite_objects(df).collect())
    assert got == sorted(_pure())


def test_fuzz_never_raises():
    rng = random.Random(52)
    real = [r["payload"] for r in fixtures.sqlite_db_rows()
            if len(r["payload"]) > 200]
    for _ in range(120):
        blob = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(0, 300)))
        assert sqlitex.parse_sqlite(blob)["objects"] == []
    # corrupted real databases: random byte flips + truncations
    for _ in range(60):
        base = bytearray(real[rng.randrange(len(real))])
        for _ in range(rng.randrange(1, 24)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        cut = rng.randrange(0, len(base) + 1)
        d = sqlitex.parse_sqlite(bytes(base[:cut]))
        assert isinstance(d["objects"], list)


def test_corrupt_record_degrades():
    """serial-type-7 record truncated mid-float: struct must not
    escape the never-raises contract (review regression)."""
    r = fixtures.sqlite_db_rows()[0]
    hdr = sqlitex.parse_header(r["payload"])
    db = sqlitex._Db(bytes(r["payload"]), hdr)
    assert db._decode_record(b"\x02\x07\x01\x02\x03") is None
    # Int32 clamps: absurd u32 header/rootpage values -> NULL
    bad = bytearray(r["payload"])
    bad[36:40] = b"\xff\xff\xff\xff"  # freelist u32 past int32
    h = sqlitex.parse_header(bytes(bad))
    assert h["freelist_pages"] is None
