"""IP/CIDR family: stdlib-ipaddress parity, CIDR vectors, LPM
semantics, Spark-vs-pure parity, plan shape."""

import ipaddress
import random

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import ipx


def test_ipv4_stdlib_parity():
    rng = random.Random(11)
    cands = ["1.2.3.4", "255.255.255.255", "0.0.0.0", "01.2.3.4",
             "1.2.3", "1.2.3.4.5", "256.1.1.1", "1.2.3.04",
             "a.b.c.d", "", " 1.2.3.4", "1.2.3.4 ", "1..2.3",
             "٤.1.1.1", "1.2.3.+4", "00.0.0.0"]
    for _ in range(600):
        cands.append(".".join(
            str(rng.randrange(0, 300))
            for _ in range(rng.choice([3, 4, 5]))))
    for s in cands:
        try:
            want = int(ipaddress.IPv4Address(s))
        except Exception:
            want = None
        assert ipx.ipv4_to_int(s) == want, s


def test_ipv6_stdlib_parity():
    rng = random.Random(12)
    cands = ["::", "::1", "1::", "fe80::1", "::ffff:1.2.3.4",
             "2001:db8::8a2e:370:7334", "1:2:3:4:5:6:7:8",
             "1:2:3:4:5:6:7:8:9", "1::2::3", ":::", "",
             "1:2:3:4:5:6:1.2.3.4", "12345::", "g::1",
             "1:2:3:4:5:6:7", "::1.2.3.4", "1.2.3.4::",
             "1:1.2.3.4::5", "::1.2.3.4:5", "+1::", "1_2::"]
    for _ in range(600):
        n = rng.choice([1, 2, 3, 4, 5, 6, 7, 8])
        gs = [format(rng.randrange(0, 65536), "x") for _ in range(n)]
        if rng.random() < 0.25:
            gs[rng.randrange(n)] = "%d.%d.%d.%d" % tuple(
                rng.randrange(256) for _ in range(4))
        s = ":".join(gs)
        if rng.random() < 0.5:
            i = rng.randrange(0, n + 1)
            s = ":".join(gs[:i]) + "::" + ":".join(gs[i:])
        cands.append(s)
    for s in cands:
        try:
            want = int(ipaddress.IPv6Address(s))
        except Exception:
            want = None
        assert ipx.ipv6_to_int(s) == want, s
    # documented divergence: scoped addresses are rejected by spec
    # (stdlib accepts the %zone suffix since 3.9)
    assert ipx.ipv6_to_int("fe80::1%eth0") is None


def test_cidr_and_hex_keys():
    assert ipx.parse_cidr("203.0.113.7/24") == (
        4, 24, ipx.ipv4_to_int("203.0.113.0"),
        ipx.ipv4_to_int("203.0.113.255"))
    assert ipx.parse_cidr("10.0.0.0/8")[2:] == (10 << 24,
                                                (11 << 24) - 1)
    assert ipx.parse_cidr("1.2.3.4") == (
        4, 32, ipx.ipv4_to_int("1.2.3.4"), ipx.ipv4_to_int("1.2.3.4"))
    assert ipx.parse_cidr("::/0") == (6, 0, 0, (1 << 128) - 1)
    assert ipx.parse_cidr("2001:db8::/32")[1:] == (
        32, 0x20010DB8 << 96, (0x20010DB8 << 96) + (1 << 96) - 1)
    for bad in ("1.2.3.4/33", "x/8", "1.2.3.4/+8", "", "10.0.0.0/",
                "1.2.3.4/8/9", None, 7):
        assert ipx.parse_cidr(bad) is None
    # hex keys sort exactly like the 128-bit integers
    rng = random.Random(13)
    vals = sorted(rng.randrange(0, 1 << 128) for _ in range(200))
    hexes = [format(v, "032x") for v in vals]
    assert hexes == sorted(hexes)
    assert ipx.ip_to_hex32("1.2.3.4") == format(
        0xFFFF00000000 | ipx.ipv4_to_int("1.2.3.4"), "032x")
    assert ipx.ip_to_hex32("::1") == "0" * 31 + "1"
    assert ipx.ip_to_hex32("nope") is None


def _pure_lpm() -> dict[str, tuple]:
    """LPM over NETBLOCKS via the pure parsers — the independent
    re-derivation both engines must match."""
    from historicaldatadocumentparsersystem_spark.extractor import \
        accesslogx
    remotes = set(fixtures.EXTRA_IPS)
    for r in fixtures.accesslog_file_rows(12):
        for row in accesslogx.parse_access_log(r["payload"])["rows"]:
            remotes.add(row[1])
    blocks = []
    for cidr, asn, org in fixtures.NETBLOCKS:
        p = ipx.parse_cidr(cidr)
        if p is not None and p[0] == 4:
            blocks.append((p[1], p[2], p[3], cidr, asn, org))
    out = {}
    for ip in remotes:
        num = ipx.ipv4_to_int(ip)
        best = None
        if num is not None:
            hits = [(pfx, a, c, o) for pfx, s, e, c, a, o in blocks
                    if s <= num <= e]
            hits.sort(key=lambda h: (-h[0], h[1], h[2]))
            best = hits[0] if hits else None
        out[ip] = (num,) + ((best[0], best[2], best[1], best[3])
                            if best else (None,) * 4)
    return out


def test_lpm_semantics():
    got = _pure_lpm()
    # depth-4 overlap: /30 beats /24 beats /12 beats /4
    assert got["203.0.113.4"][3:] == (64510, "Example Hosting VPS")
    assert got["203.0.113.0"][3:] == (64500, "Example Hosting")
    assert got["203.0.113.8"][3:] == (64500, "Example Hosting")
    # duplicate /24 tie breaks on asn
    assert got["198.51.100.0"][3] == 64502
    # pinhole /32 vs floored /24 vs /4 blanket
    assert got["192.0.2.2"][3:] == (64504, "TestNet Pinhole")
    assert got["192.0.2.6"][3] == 64503
    # /8 private; unrouted valid v4; invalid probes
    assert got["10.0.0.1"][3] == 64512
    assert got["8.8.8.8"] == (ipx.ipv4_to_int("8.8.8.8"),
                              None, None, None, None)
    assert got["2001:db8::1"] == (None,) * 5
    assert got["10.00.0.1"] == (None,) * 5


def test_spark_lookup_matches_pure(spark):
    import __spark_entry__ as e
    df = e.extra_queries()["ip_cidr_lookup"](spark, None)
    rows = {r["ip"]: (r["ip_num"], r["prefix"], r["asn"],
                      r["cidr"], r["org"]) for r in df.collect()}
    pure = _pure_lpm()
    assert set(rows) == set(pure)
    for ip, (num, pfx, cidr, asn, org) in pure.items():
        assert rows[ip] == (num, pfx, asn, cidr, org), ip


def test_lookup_plan_is_broadcast(spark):
    import __spark_entry__ as e
    df = e.extra_queries()["ip_cidr_lookup"](spark, None)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    # one shuffle total (the probe distinct); the LPM window reuses
    # its hash partitioning (WindowGroupLimit = top-1 pushdown), and
    # the only other exchanges are the broadcast + display orderBy
    assert plan.count("Exchange hashpartitioning") == 1
    assert "WindowGroupLimit" in plan
