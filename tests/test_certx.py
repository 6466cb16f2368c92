"""X.509 family: DER codec vectors, golden pin, Spark reader parity,
hygiene grading semantics, and never-raise fuzz."""

import random

import pyarrow.parquet as pq
import pytest

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import certx

GOLDEN_CERTS = "fixtures/golden_certs_seed42_n24.parquet"

COLS = ["url", "chain_pos", "version", "serial", "sig_alg",
        "issuer_cn", "issuer_dn", "subject_cn", "subject_dn",
        "not_before", "not_after", "pubkey_alg", "pubkey_bits",
        "curve", "san_dns", "san_ip", "is_ca", "self_signed",
        "key_usage", "ext_key_usage", "fingerprint_sha256"]


def _pure_rows(n: int) -> list[tuple]:
    out = []
    for r in fixtures.cert_chain_rows(n):
        for pos, c in enumerate(certx.extract_chain(r["payload"])):
            out.append((r["url"], pos) + tuple(
                c[k] for k in COLS[2:]))
    return out


def test_oid_roundtrip():
    for oid in ["2.5.4.3", "1.2.840.113549.1.1.11", "1.3.101.112",
                "1.3.6.1.5.5.7.3.1", "2.5.29.17", "1.3.132.0.34"]:
        body = certx.der_oid(oid)
        tag, val = next(certx.iter_tlv(body))
        assert tag == 0x06 and certx.decode_oid(val) == oid
    with pytest.raises(ValueError):
        certx.decode_oid(b"")
    with pytest.raises(ValueError):
        certx.decode_oid(b"\x55\x84")  # truncated arc


def test_time_vectors():
    # UTCTime sliding window (RFC 5280 4.1.2.5.1): YY<50 -> 20YY
    assert certx._decode_time(0x17, b"490101000000Z") == \
        "2049-01-01T00:00:00Z"
    assert certx._decode_time(0x17, b"500101000000Z") == \
        "1950-01-01T00:00:00Z"
    assert certx._decode_time(0x18, b"20510203040506Z") == \
        "2051-02-03T04:05:06Z"
    with pytest.raises(ValueError):
        certx._decode_time(0x17, b"9901010000Z")  # no seconds
    with pytest.raises(ValueError):
        certx._decode_time(0x18, b"20510203040506")  # no Z


def test_der_length_forms():
    short = certx.der_tlv(0x04, b"x" * 0x7F)
    assert short[1] == 0x7F
    long1 = certx.der_tlv(0x04, b"x" * 0x80)
    assert long1[1] == 0x81 and long1[2] == 0x80
    long2 = certx.der_tlv(0x04, b"x" * 300)
    assert long2[1] == 0x82
    for raw in (short, long1, long2):
        tag, val, end = certx.read_tlv(raw, 0)
        assert end == len(raw) and val == raw[2:end] or val
    with pytest.raises(ValueError):
        certx.read_tlv(b"\x04\x85\x01\x01\x01\x01\x01\x00", 0)


def test_build_parse_roundtrip():
    mod = bytes([0x9A] + list(range(1, 256)))
    der = certx.build_certificate(
        serial=0xABCDEF, sig_oid="1.2.840.113549.1.1.11",
        issuer=[("CN", "Root CA"), ("O", "Org"), ("C", "US")],
        subject=[("CN", "host.example"), ("OU", "Web")],
        not_before="2024-02-29T12:00:00Z",
        not_after="2026-02-28T12:00:00Z",
        spki=certx.build_spki("rsa", modulus=mod),
        san_dns=["host.example", "*.host.example"],
        san_ip=["10.0.0.1"], is_ca=False,
        key_usage=["digitalSignature", "keyEncipherment"],
        eku=["serverAuth"])
    c = certx.parse_certificate(der)
    assert c["version"] == 3
    assert c["serial"] == "abcdef"
    assert c["sig_alg"] == "sha256WithRSAEncryption"
    assert c["issuer_dn"] == "CN=Root CA,O=Org,C=US"
    assert c["subject_cn"] == "host.example"
    assert c["not_before"] == "2024-02-29T12:00:00Z"
    assert c["pubkey_alg"] == "rsaEncryption"
    assert c["pubkey_bits"] == 2048
    assert c["san_dns"] == ["host.example", "*.host.example"]
    assert c["san_ip"] == ["10.0.0.1"]
    assert c["key_usage"] == ["digitalSignature", "keyEncipherment"]
    assert c["ext_key_usage"] == ["serverAuth"]
    assert not c["self_signed"] and not c["is_ca"]
    # v1: no extensions block at all
    name = [("CN", "self.test")]
    v1 = certx.build_certificate(
        serial=1, sig_oid="1.2.840.113549.1.1.5",
        issuer=name, subject=name,
        not_before="2020-01-01T00:00:00Z",
        not_after="2030-01-01T00:00:00Z",
        spki=certx.build_spki("ec", curve="prime256v1"))
    c1 = certx.parse_certificate(v1)
    assert c1["version"] == 1 and c1["self_signed"]
    assert c1["curve"] == "prime256v1" and c1["pubkey_bits"] == 256
    assert c1["san_dns"] == [] and not c1["is_ca"]


def test_pem_armor():
    der = certx.build_certificate(
        serial=2, sig_oid="1.3.101.112",
        issuer=[("CN", "a")], subject=[("CN", "b")],
        not_before="2025-01-01T00:00:00Z",
        not_after="2026-01-01T00:00:00Z",
        spki=certx.build_spki("ed25519"))
    pem = certx.to_pem(der)
    assert certx.pem_to_ders(pem) == [der]
    assert certx.pem_to_ders(pem + pem) == [der, der]
    # bad base64 block skipped, good one kept
    bad = ("-----BEGIN CERTIFICATE-----\n!!!\n"
           "-----END CERTIFICATE-----\n")
    assert certx.pem_to_ders(bad + pem) == [der]
    assert certx.pem_to_ders(None) == []
    # DER payload without armor goes through extract_chain directly
    assert certx.extract_chain(der)[0]["serial"] == "02"


def test_matches_committed_golden():
    golden = [tuple(r[c] for c in COLS)
              for r in pq.read_table(GOLDEN_CERTS).to_pylist()]
    assert golden == _pure_rows(24)
    assert len(golden) == 24


def test_spark_reader_matches_golden(spark):
    from historicaldatadocumentparsersystem_spark import sources
    files = fixtures.cert_chain_rows(24)
    df = spark.createDataFrame(
        [(r["url"], r["payload"]) for r in files],
        "url string, payload binary").repartition(8)
    got = sorted(tuple(str(x) for x in r)
                 for r in sources.read_certificates(df).collect())
    want = sorted(tuple(str(x) for x in r) for r in _pure_rows(24))
    assert got == want


def test_hygiene_grades(spark):
    from historicaldatadocumentparsersystem_spark.operators \
        import certs as C
    g = spark.read.parquet(GOLDEN_CERTS)
    grades = {r.host: r.grade
              for r in C.cert_hygiene(g).collect()}
    assert grades["site0.example.net"] == "A"   # healthy chain
    assert grades["site1.example.net"] == "F"   # expired
    assert grades["site2.example.net"] == "D"   # self-signed
    assert grades["site3.example.net"] == "C"   # sha1 + RSA-1024
    assert grades["site11.example.net"] == "B"  # modern, no SAN
    assert grades["site4.example.net"] == "D"   # wildcard vs apex
    assert grades["www.site12.example.net"] == "A"  # wildcard hit
    assert grades["site5.example.net"] == "F"   # not yet valid
    assert grades["site6.example.net"] == "D"   # wrong-domain SAN
    # chain audit: 2-cert chains are DN-linked, 1-cert urls vacuous
    chains = {r.url: r for r in C.chain_integrity(g).collect()}
    c0 = chains["https://site0.example.net/"]
    assert c0.n_certs == 2 and c0.chain_linked
    assert not c0.top_self_signed
    assert chains["https://site2.example.net/"].top_self_signed


def test_fuzz_never_raises():
    rng = random.Random(7)
    der = certx.build_certificate(
        serial=3, sig_oid="1.2.840.113549.1.1.11",
        issuer=[("CN", "f")], subject=[("CN", "g")],
        not_before="2025-01-01T00:00:00Z",
        not_after="2026-01-01T00:00:00Z",
        spki=certx.build_spki("rsa", modulus=bytes([0x80] * 64)),
        san_dns=["f.test"], is_ca=True)
    for _ in range(500):
        blob = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(0, 120)))
        assert isinstance(certx.extract_chain(blob), list)
    for i in range(len(der)):
        certx.extract_chain(der[:i])        # truncations
        mut = bytearray(der)
        mut[i % len(der)] ^= 0xFF
        certx.extract_chain(bytes(mut))     # single-byte flips


def test_hygiene_strips_explicit_port(spark):
    """ADVICE r4: https://host:8443/ must grade on the host alone —
    the :port previously defeated SAN coverage and forced D."""
    import pyspark.sql.functions as F
    from historicaldatadocumentparsersystem_spark.operators \
        import certs as C
    g = spark.read.parquet(GOLDEN_CERTS)
    ported = g.withColumn(
        "url", F.regexp_replace(
            "url", "site0\\.example\\.net/",
            "site0.example.net:8443/"))
    row = {r.host: r for r in C.cert_hygiene(ported).collect()}[
        "site0.example.net"]
    assert row.url == "https://site0.example.net:8443/"
    assert row.host_covered and not row.san_mismatch
    assert row.grade == "A"
