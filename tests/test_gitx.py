"""Git family: delta application, oid parity with the git binary,
pack index-pack cross-check, golden pin, Spark parity, fuzz."""

import random
import shutil
import subprocess

import pyarrow.parquet as pq
import pytest

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import gitx

GOLDEN = "fixtures/golden_git_seed42_n6.parquet"
COLS = ["pos", "row_kind", "container", "otype", "size",
        "packed_size", "oid", "delta_of", "tree", "parent",
        "author_email", "author_ts", "title", "mode", "name",
        "entry_sha"]


def _pack_payload() -> bytes:
    return fixtures.git_object_rows()[0]["payload"]


def test_delta_vectors():
    base = b"0123456789"
    # copy(2..7) + insert "XY" + copy(0..3)
    delta = (b"\x0a\x0a"
             + bytes([0x80 | 0x01 | 0x10, 2, 5])
             + bytes([2]) + b"XY"
             + bytes([0x80 | 0x10, 3]))
    assert gitx._apply_delta(base, delta) == b"23456XY012"
    # size mismatch / bad base size rejected
    assert gitx._apply_delta(base, b"\x05\x03" + b"\x03abc") \
        is None
    assert gitx._apply_delta(base, b"\x0a\x03" + b"\x02ab") is None


def test_pack_resolves_deltas():
    d = gitx.parse_pack(_pack_payload(), with_content=True)
    assert (d["version"], d["n_declared"]) == (2, 6)
    types = [o[1] for o in d["objects"]]
    assert types == ["commit", "commit", "tree", "blob", "blob",
                     "blob"]
    # both delta objects resolved against the plain blob's oid
    blob1_oid = d["objects"][3][4]
    assert d["objects"][4][5] == blob1_oid  # ofs-delta
    assert d["objects"][5][5] == blob1_oid  # ref-delta
    assert d["contents"][d["objects"][4][4]].endswith(
        b"respect robots.txt\n")
    # commit graph fields parse
    c2 = gitx.parse_commit(d["contents"][d["objects"][0][4]])
    assert c2["author_email"] == "bo@example.org"
    assert c2["author_ts"] == 1730000600
    assert c2["title"] == "add robots guidance"
    assert len(c2["parents"]) == 1
    # tree entries parse with hex shas
    tr = gitx.parse_tree(d["contents"][d["objects"][2][4]])
    assert [(e[0], e[1]) for e in tr] == \
        [("100644", "notes.md"), ("40000", "docs")]


@pytest.mark.skipif(shutil.which("git") is None,
                    reason="git binary unavailable")
def test_oids_match_git_binary(tmp_path):
    d = gitx.parse_pack(_pack_payload(), with_content=True)
    for (_pos, otype, _size, _packed, oid, _base) in \
            d["objects"]:
        out = subprocess.run(
            ["git", "hash-object", "-t", otype, "--stdin"],
            input=d["contents"][oid], capture_output=True,
            timeout=30)
        assert out.stdout.decode().strip() == oid
    # the whole pack indexes cleanly under real git
    repo = tmp_path / "r"
    subprocess.run(["git", "init", "-q", str(repo)], timeout=30,
                   check=True)
    pk = tmp_path / "p.pack"
    pk.write_bytes(_pack_payload())
    r = subprocess.run(["git", "-C", str(repo), "index-pack",
                        str(pk)], capture_output=True, timeout=30)
    assert r.returncode == 0, r.stderr


def test_guards():
    import zlib
    # decompression bomb: a few-hundred-KB loose object claiming
    # hundreds of MB never materializes — bounded inflate rejects
    bomb = zlib.compress(b"\x00" * (200 * 1024 * 1024), 9)
    assert gitx.parse_loose(bomb) is None
    # author timestamp trust gate: unbounded digits -> NULL ts
    c = gitx.parse_commit(
        b"tree " + b"0" * 40
        + b"\nauthor X <x@y> 99999999999999999999999 +0000\n\nm")
    assert c["author_ts"] is None and c["author_email"] == "x@y"
    # delta expansion bomb: repeated 64 KB copy ops into a 5-byte
    # declared output bail at the in-loop bound, not after
    # materializing  (src=70000 varint, out=5, 3x op 0x80)
    base = b"0123456789" * 7000
    delta = bytes([0xF0, 0xA2, 0x04, 0x05]) + bytes([0x80]) * 3
    assert gitx._apply_delta(base, delta) is None


def test_loose_objects():
    by = {r["url"].rsplit("/", 1)[1]:
          gitx.parse_loose(r["payload"])
          for r in fixtures.git_object_rows()
          if "pack" not in r["url"] }
    assert by["loose-commit"]["otype"] == "commit"
    assert by["loose-blob"]["oid"] == \
        "aebcc801fa3012539d7e452a16cd14d7c9e09d27"
    assert by["loose-tag"]["otype"] == "tag"
    assert by["junk.bin"] is None


def _pure() -> list[tuple]:
    # mirror the reader exactly (pos is per-url running index)
    rows_by_url: dict = {}
    for r in fixtures.git_object_rows():
        pb = r["payload"]
        rows = rows_by_url.setdefault(r["url"], [])

        def emit(container, otype, size, packed, oid_, delta_of,
                 content):
            rows.append((r["url"], len(rows), "object",
                         container, otype, size, packed, oid_,
                         delta_of) + (None,) * 8)
            if otype == "commit" and content is not None:
                c = gitx.parse_commit(content)
                for parent in (c["parents"] or [None]):
                    rows.append((r["url"], len(rows), "commit",
                                 container, otype, None, None,
                                 oid_, None, c["tree"], parent,
                                 c["author_email"],
                                 c["author_ts"], c["title"],
                                 None, None, None))
            elif otype == "tree" and content is not None:
                for (mode, name, sha) in gitx.parse_tree(content):
                    rows.append((r["url"], len(rows),
                                 "tree_entry", container, otype,
                                 None, None, oid_, None, None,
                                 None, None, None, None, mode,
                                 name, sha))

        if pb[:4] == b"PACK":
            d = gitx.parse_pack(pb, with_content=True)
            for (pos, otype, size, packed, oid_, delta_of) in \
                    d["objects"]:
                emit("pack", otype, size, packed, oid_, delta_of,
                     d["contents"].get(oid_))
        else:
            lo = gitx.parse_loose(pb)
            if lo is None:
                continue
            emit("loose", lo["otype"], lo["size"], len(pb),
                 lo["oid"], None, lo["content"])
    return [t for rows in rows_by_url.values() for t in rows]


def test_match_committed_golden():
    got = [(r["url"],) + tuple(r[c] for c in COLS)
           for r in pq.read_table(GOLDEN).to_pylist()]
    assert sorted(got) == sorted(_pure()) and len(got) == 14


def test_spark_reader_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    df = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.git_object_rows()],
        "url string, payload binary").repartition(8)
    got = sorted(tuple(r) for r in
                 sources.read_git_objects(df).collect())
    assert got == sorted(_pure())


def test_fuzz_never_raises():
    rng = random.Random(67)
    pack = _pack_payload()
    for _ in range(150):
        blob = b"PACK" + bytes(rng.randrange(256)
                               for _ in range(rng.randrange(0,
                                                            200)))
        assert isinstance(gitx.parse_pack(blob)["objects"], list)
        lo = gitx.parse_loose(bytes(
            rng.randrange(256)
            for _ in range(rng.randrange(0, 80))))
        assert lo is None or isinstance(lo, dict)
    for _ in range(80):
        base = bytearray(pack)
        for _ in range(rng.randrange(1, 12)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        d = gitx.parse_pack(bytes(base[:rng.randrange(
            0, len(base) + 1)]))
        assert isinstance(d["objects"], list)
