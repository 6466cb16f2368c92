"""BitTorrent metainfo source: bencode vectors, span infohash,
golden pin, Spark parity, fuzz."""

import hashlib
import random

import pyarrow.parquet as pq
import pytest

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import \
    torrentx

GOLDEN_TORRENTS = "fixtures/golden_torrents_seed42_n12.parquet"


def _pure_rows(n: int) -> list[tuple]:
    out = []
    for r in fixtures.torrent_file_rows(n):
        d = torrentx.parse_torrent(r["payload"])
        if d is None:
            continue
        for idx, (path, length) in enumerate(d["files"]):
            out.append((r["url"], idx, path, length, d["name"],
                        d["infohash"], d["piece_length"],
                        d["n_pieces"], d["private"], d["announce"],
                        len(d["trackers"]), d["creation_date"],
                        d["created_by"]))
    return out


def test_bencode_vectors():
    enc = torrentx.encode_bencode
    dec = torrentx.decode_bencode
    assert dec(b"i42e") == 42 and dec(b"i-7e") == -7
    assert dec(b"4:spam") == b"spam" and dec(b"0:") == b""
    assert dec(b"l4:spami2ee") == [b"spam", 2]
    assert dec(b"d3:bar4:spam3:fooi42ee") == {b"bar": b"spam",
                                              b"foo": 42}
    # round trip
    v = {"a": [1, "x", {"b": b"\x00\xff"}], "z": -5}
    assert dec(enc(v)) == {b"a": [1, b"x", {b"b": b"\x00\xff"}],
                           b"z": -5}
    for bad in (b"i03e", b"i-0e", b"ie", b"i42", b"01:x", b"5:abc",
                b"l", b"d3:ae", b"di1e1:xe", b"d1:a1:b1:a1:ce",
                b"i1ex", b""):
        with pytest.raises(ValueError):
            dec(bad)
    # unsorted keys tolerated (real-world), duplicates reject
    assert dec(b"d1:b1:x1:a1:ye") == {b"b": b"x", b"a": b"y"}


def test_infohash_is_raw_span():
    # non-canonical info dict: re-encoding would sort keys and
    # change the hash — the span hash must match the raw bytes
    nc = (b"d4:infod4:name3:abc12:piece lengthi1e6:lengthi9e"
          b"6:pieces20:" + b"p" * 20 + b"e8:announce5:http:e")
    d = torrentx.parse_torrent(nc)
    s = nc.find(b"d4:name")
    e = nc.find(b"e8:announce") + 1
    assert d["infohash"] == hashlib.sha1(nc[s:e]).hexdigest()
    assert d["infohash"] != hashlib.sha1(
        torrentx.encode_bencode(torrentx.decode_bencode(nc)[b"info"])
    ).hexdigest()


def test_metainfo_semantics():
    d = torrentx.parse_torrent(
        fixtures.torrent_file_rows(12)[0]["payload"])
    assert d["files"][0][0] == "data/part-0.bin"
    assert d["trackers"][1][0] == 1       # tier index
    total = sum(x for _, x in d["files"])
    assert d["n_pieces"] == (total + d["piece_length"] - 1) \
        // d["piece_length"]
    # single-file + deliberately wrong piece count (shape k=1)
    d1 = torrentx.parse_torrent(
        fixtures.torrent_file_rows(12)[1]["payload"])
    assert d1["private"] and len(d1["files"]) == 1
    total1 = d1["files"][0][1]
    assert d1["n_pieces"] != (total1 + d1["piece_length"] - 1) \
        // d1["piece_length"]
    # rejects
    assert torrentx.parse_torrent(b"i42e") is None
    assert torrentx.parse_torrent(b"d4:infoi1ee") is None
    assert torrentx.parse_torrent(None) is None


def test_matches_committed_golden():
    cols = ["url", "file_idx", "path", "length", "name", "infohash",
            "piece_length", "n_pieces", "private", "announce",
            "n_trackers", "creation_date", "created_by"]
    golden = [tuple(r[c] for c in cols)
              for r in pq.read_table(GOLDEN_TORRENTS).to_pylist()]
    assert golden == _pure_rows(12)
    assert len(golden) == 15


def test_spark_reader_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    files = fixtures.torrent_file_rows(12)
    df = spark.createDataFrame(
        [(r["url"], r["payload"]) for r in files],
        "url string, payload binary").repartition(8)
    got = sorted(tuple(str(x) for x in r)
                 for r in sources.read_torrent_files(df).collect())
    want = sorted(tuple(str(x) for x in r) for r in _pure_rows(12))
    assert got == want


def test_fuzz_never_raises():
    rng = random.Random(6)
    base = fixtures.torrent_file_rows(1)[0]["payload"]
    for _ in range(400):
        blob = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(0, 120)))
        torrentx.parse_torrent(blob)
    for i in range(len(base)):
        torrentx.parse_torrent(base[:i])
    # deep nesting stops at the cap instead of recursing forever
    assert torrentx.parse_torrent(b"l" * 100 + b"e" * 100) is None
