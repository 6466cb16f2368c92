"""OpenPGP family: armor/CRC24 vectors, packet-header length
encodings, gpg parity (fingerprint + packet census), golden pin,
Spark parity, fuzz."""

import random
import shutil
import subprocess
import tempfile

import pyarrow.parquet as pq
import pytest

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import pgpx

GOLDEN = "fixtures/golden_pgp_seed42_n6.parquet"


def _by_name():
    return {r["url"].rsplit("/", 1)[1]: r["payload"]
            for r in fixtures.pgp_blob_rows()}


def test_armor_and_crc():
    by = _by_name()
    d = pgpx.extract_pgp(by["ana.asc"])
    assert d["kind"] == "PUBLIC KEY BLOCK"
    assert d["n_headers"] == 2 and d["crc_ok"] is True
    names = [p["name"] for p in d["packets"]]
    assert names == ["public-key", "user-id", "public-subkey"]
    key = d["packets"][0]
    assert key["algorithm"] == "eddsa"
    assert key["created"] == "2020-09-13T12:26:40Z"
    assert len(key["fingerprint"]) == 40
    # corrupted CRC line flags, packets still walk
    bad = pgpx.extract_pgp(by["release.sig"])
    assert bad["crc_ok"] is False
    assert bad["packets"][0]["name"] == "signature"
    # old-format binary + two-byte new-length user id
    assert pgpx.extract_pgp(by["binary.pgp"])["kind"] == "BINARY"
    lng = pgpx.extract_pgp(by["long.pgp"])
    assert lng["packets"][1]["length"] == 300
    assert pgpx.extract_pgp(by["cut.asc"]) is None
    assert pgpx.extract_pgp(by["junk.txt"]) is None
    assert pgpx.extract_pgp(None) is None


def test_crc24_vector():
    # RFC 4880's CRC-24/OPENPGP: check value for "123456789"
    assert pgpx._crc24(b"123456789") == 0x21CF02


@pytest.mark.skipif(shutil.which("gpg") is None,
                    reason="gpg unavailable")
def test_gpg_parity():
    """A REAL gpg-generated key: our fingerprint must equal gpg's
    own (colon listing), and the packet census must include the
    key/uid/subkey triple."""
    with tempfile.TemporaryDirectory() as td:
        env = {"GNUPGHOME": td, "HOME": td, "PATH": "/usr/bin:/bin"}
        subprocess.run(
            ["gpg", "--batch", "--pinentry-mode", "loopback",
             "--passphrase", "", "--quick-generate-key",
             "parity@example.org", "ed25519", "sign", "never"],
            env=env, check=True, capture_output=True)
        exp = subprocess.run(
            ["gpg", "--batch", "--export", "parity@example.org"],
            env=env, check=True, capture_output=True).stdout
        cols = subprocess.run(
            ["gpg", "--batch", "--with-colons", "--fingerprint",
             "--list-keys"],
            env=env, check=True, capture_output=True
        ).stdout.decode()
    fprs = [ln.split(":")[9] for ln in cols.splitlines()
            if ln.startswith("fpr:")]
    d = pgpx.extract_pgp(exp)
    assert d is not None
    got = [p["fingerprint"] for p in d["packets"]
           if p["fingerprint"]]
    assert got and got[0].upper() == fprs[0]
    names = [p["name"] for p in d["packets"]]
    assert "public-key" in names and "user-id" in names


def _pure():
    out = []
    for r in fixtures.pgp_blob_rows():
        d = pgpx.extract_pgp(r["payload"])
        if d is None:
            continue
        out.append((r["url"], 0, "block", d["kind"],
                    d["n_headers"], d["crc_ok"], None, None, None,
                    None, None, None, None, None))
        for p in d["packets"]:
            out.append((r["url"], p["pos"], "packet", None, None,
                        None, p["tag"], p["name"], p["length"],
                        p["version"], p["algorithm"], p["created"],
                        p["user_id"], p["fingerprint"]))
    return out


def test_match_committed_golden():
    got = [tuple(r.values())
           for r in pq.read_table(GOLDEN).to_pylist()]
    assert got == _pure() and len(got) == 11


def test_spark_reader_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    df = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.pgp_blob_rows()],
        "url string, payload binary").repartition(4)
    got = sorted((tuple(r) for r in
                  sources.read_pgp_blocks(df).collect()), key=str)
    assert got == sorted(_pure(), key=str)


def test_fuzz_never_raises():
    rng = random.Random(72)
    real = [r["payload"] for r in fixtures.pgp_blob_rows()
            if len(r["payload"]) > 20]
    for _ in range(150):
        blob = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(0, 150)))
        pgpx.extract_pgp(blob)
        pgpx.parse_packets(blob)
    for _ in range(80):
        base = bytearray(real[rng.randrange(len(real))])
        for _ in range(rng.randrange(1, 8)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        pgpx.extract_pgp(bytes(base[:rng.randrange(
            0, len(base) + 1)]))
