"""IP address + CIDR parsing — pure Python, from scratch,
Spark-free.

The network side of log analytics: mapping a request's remote
address to its announcing network (ASN/org) is how crawl operators
separate bot fleets, cloud ranges, and residential traffic. The
interesting part at scale is LONGEST-PREFIX MATCH: real routing
tables overlap (a /24 announced inside a covering /12), and the
most specific block wins.

Design notes
- IPv4 is STRICT dotted-quad (no leading zeros, 0-255) so the
  semantics equal stdlib ``ipaddress.IPv4Address`` — the free
  oracle tests pin against. ``IPV4_RE`` is shared verbatim with
  both engines' SQL (RE2- and Java-safe: no ``\\s``, no
  lookahead).
- IPv6 parses to a 32-char lowercase hex key: hex strings of the
  padded 128-bit value sort IDENTICALLY to the integers, so range
  membership is a plain string BETWEEN in any engine (no int128
  needed). Scoped addresses (``%zone``) are rejected.
- CIDR blocks parse to inclusive [start, end] keys with the HOST
  BITS FLOORED (a "203.0.113.7/24" spec means the block containing
  that address, the permissive reading used by blocklist files).

Reference anchor: the reference's pipeline has no network
analytics; this extends the crawl-ecosystem family
(doc_processor.py:1 models only the fetch side).
"""

from __future__ import annotations

# Strict dotted-quad octet: 250-255 / 200-249 / 100-199 / 10-99 /
# 0-9 — no leading zeros. Shared with the Spark + DuckDB SQL.
OCTET_RE = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9][0-9]|[0-9])"
IPV4_RE = rf"^{OCTET_RE}\.{OCTET_RE}\.{OCTET_RE}\.{OCTET_RE}$"

_HEX = "0123456789abcdef"


def ipv4_to_int(s) -> int | None:
    """Strict dotted-quad -> int in [0, 2^32); None otherwise."""
    if not isinstance(s, str):
        return None
    parts = s.split(".")
    if len(parts) != 4:
        return None
    val = 0
    for p in parts:
        if not p.isdigit() or not p.isascii():
            return None
        if len(p) > 3 or (len(p) > 1 and p[0] == "0"):
            return None
        o = int(p)
        if o > 255:
            return None
        val = val * 256 + o
    return val


def int_to_ipv4(v: int) -> str:
    return ".".join(str((v >> s) & 255) for s in (24, 16, 8, 0))


def int_to_ipv6(v: int) -> str:
    """int in [0, 2^128) -> RFC 5952 canonical text: lowercase,
    no leading zeros, the LONGEST run of >=2 zero groups compressed
    to ``::`` (leftmost on ties; a single zero group is never
    compressed). Pinned vs stdlib ipaddress in tests/test_pcapx.py
    (the idnx-vs-stdlib-codec pattern)."""
    groups = [(v >> (16 * (7 - i))) & 0xFFFF for i in range(8)]
    best_start = best_len = -1
    i = 0
    while i < 8:
        if groups[i] == 0:
            j = i
            while j < 8 and groups[j] == 0:
                j += 1
            if j - i > best_len:
                best_start, best_len = i, j - i
            i = j
        else:
            i += 1
    if best_len >= 2:
        head = ":".join(f"{g:x}" for g in groups[:best_start])
        tail = ":".join(f"{g:x}"
                        for g in groups[best_start + best_len:])
        return f"{head}::{tail}"
    return ":".join(f"{g:x}" for g in groups)


def ipv6_to_int(s) -> int | None:
    """RFC 4291 textual IPv6 -> int in [0, 2^128); None otherwise.
    Accepts ``::`` compression and a trailing embedded dotted-quad;
    rejects scoped addresses (``%zone``) and malformed groups."""
    if not isinstance(s, str) or not s or "%" in s:
        return None
    if s.count("::") > 1:
        return None
    head, _, tail = s.partition("::")
    compressed = "::" in s
    hgroups = head.split(":") if head else []
    tgroups = tail.split(":") if tail else []
    if not compressed:
        if len(hgroups) < 2:
            return None
    else:
        # "::x" / "x::" leave an empty split artifact only when the
        # whole side is empty (handled above); an empty group INSIDE
        # a side means ":::" or ":x" forms — malformed.
        if "" in hgroups or "" in tgroups:
            return None

    def expand(groups: list[str], terminal: bool
               ) -> list[int] | None:
        out: list[int] = []
        for i, g in enumerate(groups):
            if "." in g:
                # embedded dotted-quad is legal only as the LAST
                # 32 bits of the whole address
                if not terminal or i != len(groups) - 1:
                    return None
                v4 = ipv4_to_int(g)
                if v4 is None:
                    return None
                out.append(v4 >> 16)
                out.append(v4 & 0xFFFF)
                continue
            if not 1 <= len(g) <= 4:
                return None
            try:
                out.append(int(g, 16))
            except ValueError:
                return None
            if any(c not in "0123456789abcdefABCDEF" for c in g):
                return None
        return out

    h = expand(hgroups, terminal=not compressed)
    t = expand(tgroups, terminal=True)
    if h is None or t is None:
        return None
    if compressed:
        fill = 8 - len(h) - len(t)
        if fill < 1:
            return None
        groups16 = h + [0] * fill + t
    else:
        groups16 = h
    if len(groups16) != 8:
        return None
    val = 0
    for g in groups16:
        val = val * 65536 + g
    return val


def ip_to_hex32(s) -> str | None:
    """Any textual IP -> 32-char lowercase hex of the 128-bit value
    (IPv4 as IPv4-mapped ::ffff:a.b.c.d). Hex keys sort like the
    integers, so [start_hex, end_hex] BETWEEN is range membership."""
    v4 = ipv4_to_int(s)
    if v4 is not None:
        return format(0xFFFF00000000 | v4, "032x")
    v6 = ipv6_to_int(s)
    return None if v6 is None else format(v6, "032x")


def parse_cidr(s) -> tuple[int, int, int, int] | None:
    """"a.b.c.d/n" -> (version=4, prefix, start, end) inclusive,
    host bits floored; "h:h::/n" -> (6, prefix, start, end) over
    the 128-bit ints. A bare address is a host block (/32, /128)."""
    if not isinstance(s, str) or not s:
        return None
    addr, slash, pfx = s.partition("/")
    if "." in addr and ":" not in addr:
        bits, val = 32, ipv4_to_int(addr)
        version = 4
    else:
        bits, val = 128, ipv6_to_int(addr)
        version = 6
    if val is None:
        return None
    if slash:
        if not (pfx.isdigit() and pfx.isascii()) or len(pfx) > 3:
            return None
        prefix = int(pfx)
        if prefix > bits:
            return None
    else:
        prefix = bits
    size = 1 << (bits - prefix)
    start = val - (val % size)
    return (version, prefix, start, start + size - 1)
