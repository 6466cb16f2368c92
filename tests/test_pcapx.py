"""PCAP family: layer vectors, stdlib-pinned IPv6 text, golden pin,
Spark parity, fuzz."""

import ipaddress
import random

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import pcapx
from historicaldatadocumentparsersystem_spark.extractor.ipx import \
    int_to_ipv6

GOLDEN = "fixtures/golden_pcap_seed42_n10.parquet"
COLS = ["pos", "ts_ms", "orig_len", "incl_len", "src_mac",
        "dst_mac", "ethertype", "src_ip", "dst_ip", "proto",
        "src_port", "dst_port", "tcp_flags"]


def test_ipv6_text_pinned_vs_stdlib():
    """RFC 5952 formatter vs the stdlib, including the tie and
    single-zero-group rules."""
    for v in (0, 1, (1 << 128) - 1,
              0x20010DB8000000000000000000000001,
              0x00010000000000020000000000000003,   # tie: leftmost
              0x20010DB8000100020003000400050006):  # no run >= 2
        assert int_to_ipv6(v) == str(ipaddress.IPv6Address(v)), v
    rng = random.Random(54)
    for _ in range(500):
        v = rng.getrandbits(rng.choice([16, 48, 96, 128]))
        assert int_to_ipv6(v) == str(ipaddress.IPv6Address(v)), v


def _by_name():
    return {r["url"].rsplit("/", 1)[1]:
            pcapx.parse_pcap(r["payload"])
            for r in fixtures.pcap_capture_rows()}


def test_layers_and_endianness():
    by = _by_name()
    s = by["session.pcap"]["packets"]
    assert [p["tcp_flags"] for p in s] == \
        ["S", "SA", "A", "PA", "FA"]
    assert s[0]["ts_ms"] == 1730000000001  # exact integer epoch-ms
    # big-endian capture decodes identically
    d = by["dns.pcap"]["packets"]
    assert (d[0]["proto"], d[0]["dst_port"]) == ("udp", 53)
    assert d[2]["proto"] == "icmp" and d[2]["src_port"] is None
    # nanosecond magic: frac // 10^6
    v6 = by["v6.pcap"]
    assert v6["nano"] and v6["packets"][0]["ts_ms"] == \
        1730000000500
    assert v6["packets"][0]["src_ip"] == "2001:db8::1"
    assert v6["packets"][0]["dst_ip"] == \
        "2001:db8:0:85a3::ac1f:8001"
    # VLAN unwrap reaches the inner IPv4
    assert by["vlan.pcap"]["packets"][0]["src_ip"] == "192.168.7.9"
    # raw-IP linktype: no MACs, both families
    r = by["rawip.pcap"]["packets"]
    assert r[0]["src_mac"] is None and r[0]["proto"] == "tcp"
    assert r[1]["src_ip"] == "2001:db8::1"
    # ARP: link layer only
    a = by["arp.pcap"]["packets"][0]
    assert a["ethertype"] == 0x0806 and a["src_ip"] is None
    # truncated trailing record dropped, prior packet kept
    assert len(by["arp.pcap"]["packets"]) == 1
    # snaplen cut: eth decoded, IP not; orig_len preserved
    sn = by["snap.pcap"]["packets"][0]
    assert sn["incl_len"] == 20 and sn["orig_len"] > 20
    assert sn["src_mac"] is not None and sn["src_ip"] is None
    assert by["noise.bin"]["packets"] == []
    assert by["empty.pcap"]["packets"] == []


def _pure() -> list[tuple]:
    out = []
    for r in fixtures.pcap_capture_rows():
        for p in pcapx.parse_pcap(r["payload"])["packets"]:
            out.append((r["url"],) + tuple(p[c] for c in COLS))
    return out


def test_match_committed_golden():
    got = [(r["url"],) + tuple(r[c] for c in COLS)
           for r in pq.read_table(GOLDEN).to_pylist()]
    assert got == _pure() and len(got) == 75


def test_spark_reader_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark import sources
    df = spark.createDataFrame(
        [(r["url"], r["payload"])
         for r in fixtures.pcap_capture_rows()],
        "url string, payload binary").repartition(8)
    got = sorted(tuple(r) for r in
                 sources.read_pcap_packets(df).collect())
    assert got == sorted(_pure())


def test_fuzz_never_raises():
    rng = random.Random(55)
    real = [r["payload"] for r in fixtures.pcap_capture_rows()
            if len(r["payload"]) > 40]
    hdr = real[0][:24]
    for _ in range(150):
        blob = hdr + bytes(rng.randrange(256)
                           for _ in range(rng.randrange(0, 200)))
        assert isinstance(pcapx.parse_pcap(blob)["packets"], list)
    for _ in range(80):
        base = bytearray(real[rng.randrange(len(real))])
        for _ in range(rng.randrange(1, 12)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        d = pcapx.parse_pcap(bytes(base[:rng.randrange(
            0, len(base) + 1)]))
        assert isinstance(d["packets"], list)


def test_orig_len_clamp():
    """orig_len is an unvalidated u32: past int32 -> NULL, never a
    crashed Arrow batch (review regression)."""
    import struct
    base = fixtures.pcap_capture_rows()[0]["payload"]
    hdr = base[:24]
    rec = struct.pack("<IIII", 1730000000, 0, 4, 0xFFFFFFFF) \
        + b"\x00" * 4
    pkts = pcapx.parse_pcap(hdr + rec)["packets"]
    assert pkts[0]["orig_len"] is None
    assert pkts[0]["incl_len"] == 4
