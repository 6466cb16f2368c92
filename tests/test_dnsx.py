"""DNS family: name-compression vectors, rdata rendering, golden
pin, Spark parity, fuzz."""

import random

import pyarrow.parquet as pq
import pytest

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import dnsx

GOLDEN = "fixtures/golden_dns_seed42_n10.parquet"
COLS = ["pos", "section", "name", "rtype", "ttl", "rdata",
        "msg_id", "is_response", "opcode", "rcode", "truncated"]


def test_name_decompression_vectors():
    # RFC 1035 §4.1.4 style: F.ISI.ARPA at 20, FOO.F.ISI.ARPA via
    # pointer, pointer-only name
    b = bytearray(64)
    b[20:33] = b"\x01f\x03isi\x04arpa\x00"
    b[40:46] = b"\x03foo\xc0\x14"
    b[50:52] = b"\xc0\x28"
    assert dnsx._name(bytes(b), 20) == ("f.isi.arpa", 32)
    assert dnsx._name(bytes(b), 40) == ("foo.f.isi.arpa", 46)
    assert dnsx._name(bytes(b), 50) == ("foo.f.isi.arpa", 52)
    # forward/self pointers are loops -> rejected
    with pytest.raises(ValueError):
        dnsx._name(b"\xc0\x00", 0)
    with pytest.raises(ValueError):
        dnsx._name(b"\x03abc\xc0\x04", 0)
    with pytest.raises(ValueError):
        dnsx._name(b"\x05ab", 0)


def _by_name():
    return {r["url"].rsplit("/", 1)[1].removesuffix(".bin"):
            dnsx.parse_dns(r["payload"])
            for r in fixtures.dns_message_rows()}


def test_message_shapes():
    by = _by_name()
    q = by["query"]
    assert not q["msg"]["is_response"]
    assert q["records"] == [(0, "question", "www.example.org",
                             "A", None, None)]
    # CNAME + A rdata rendering
    recs = by["a-cname"]["records"]
    assert recs[1][3:] == ("CNAME", 300, "example.org")
    assert recs[2][5] == "93.184.216.34"
    # AAAA through the RFC 5952 formatter
    assert by["aaaa"]["records"][1][5] == "2001:db8::1"
    # MX pref + exchange, multi-string TXT joined
    mx = by["mx-txt"]["records"]
    assert mx[1][5] == "10 mail.example.org"
    assert mx[2][5] == "v=spf1 include:_spf.example.org ~all"
    # SOA in authority of an NXDOMAIN
    nx = by["nxdomain"]
    assert nx["msg"]["rcode"] == "nxdomain"
    assert nx["records"][1][1] == "authority"
    assert nx["records"][1][5] == "ns1.example.org 2024102701"
    # truncation: TC bit seen, cut answer dropped, question kept
    tr = by["truncated"]
    assert tr["msg"]["truncated"] and len(tr["records"]) == 1
    assert by["junk"]["msg"] is None
    # punycode labels pass through verbatim
    assert by["punycode"]["records"][1][5] == \
        "xn--bcher-kva.example"
    # EDNS OPT renders as opaque bytes, root name allowed
    assert by["edns"]["records"][1][2:] == \
        ("", "OPT", 0, "bytes:4")
    assert len(by["rotation"]["records"]) == 21


def _pure() -> list[tuple]:
    out = []
    for r in fixtures.dns_message_rows():
        d = dnsx.parse_dns(r["payload"])
        m = d["msg"]
        if m is None:
            continue
        for (pos, section, name, rtype, ttl, rdata) in d["records"]:
            out.append((r["url"], pos, section, name, rtype, ttl,
                        rdata, m["msg_id"], m["is_response"],
                        m["opcode"], m["rcode"], m["truncated"]))
    return out


def test_match_committed_golden():
    got = [(r["url"],) + tuple(r[c] for c in COLS)
           for r in pq.read_table(GOLDEN).to_pylist()]
    assert got == _pure() and len(got) == 39


def test_spark_reader_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    df = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.dns_message_rows()],
        "url string, payload binary").repartition(8)
    got = sorted(tuple(r) for r in
                 sources.read_dns_records(df).collect())
    assert got == sorted(_pure())


def test_fuzz_never_raises():
    rng = random.Random(56)
    real = [r["payload"] for r in fixtures.dns_message_rows()
            if len(r["payload"]) > 16]
    for _ in range(200):
        blob = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(0, 120)))
        assert isinstance(dnsx.parse_dns(blob)["records"], list)
    for _ in range(100):
        base = bytearray(real[rng.randrange(len(real))])
        for _ in range(rng.randrange(1, 10)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        d = dnsx.parse_dns(bytes(base[:rng.randrange(
            0, len(base) + 1)]))
        assert isinstance(d["records"], list)
