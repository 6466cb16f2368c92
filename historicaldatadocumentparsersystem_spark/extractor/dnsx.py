"""DNS wire-format message reader — pure Python, from scratch over
RFC 1035 (+AAAA/RFC 3596), Spark-free.

Resolver logs and passive-DNS dumps are the naming-side complement
of ``pcapx`` (wire) and ``idnx`` (label policy): the engine's view
is INDEX-SHAPED — header flags and one row per question/resource
record with the rdata rendered to text for the types a crawl
pipeline joins on (A, AAAA via the RFC 5952 formatter, CNAME/NS/
PTR, MX, TXT, SOA), everything else as an opaque ``bytes:N``.

Name decompression follows the RFC's pointer scheme with the
strictly-backwards guard (a pointer at or past its own offset is an
infinite loop — the record is dropped, parsing stops at the section
boundary; everything already parsed is kept). Punycode labels pass
through verbatim — policy belongs to ``idnx``, not the decoder.
"""

from __future__ import annotations

from .ipx import int_to_ipv4, int_to_ipv6

_TYPES = {1: "A", 2: "NS", 5: "CNAME", 6: "SOA", 12: "PTR",
          15: "MX", 16: "TXT", 28: "AAAA", 33: "SRV", 41: "OPT",
          46: "RRSIG", 47: "NSEC", 48: "DNSKEY", 257: "CAA"}
_OPCODES = {0: "query", 1: "iquery", 2: "status", 4: "notify",
            5: "update"}
_RCODES = {0: "noerror", 1: "formerr", 2: "servfail", 3: "nxdomain",
           4: "notimp", 5: "refused"}


def _name(b: bytes, off: int) -> tuple[str, int]:
    """Decompress a domain name at off -> (name, next_off).
    Raises ValueError on overrun, forward pointers, or length
    abuse."""
    labels: list[str] = []
    end = None  # next_off after the first pointer jump
    total = 0
    while True:
        if off >= len(b):
            raise ValueError("name overrun")
        c = b[off]
        if c == 0:
            if end is None:
                end = off + 1
            return ".".join(labels), end
        if c & 0xC0 == 0xC0:
            if off + 1 >= len(b):
                raise ValueError("pointer overrun")
            target = ((c & 0x3F) << 8) | b[off + 1]
            if target >= off:  # must point strictly backwards
                raise ValueError("forward pointer")
            if end is None:
                end = off + 2
            off = target
            continue
        if c & 0xC0:
            raise ValueError("reserved label type")
        if off + 1 + c > len(b):
            raise ValueError("label overrun")
        total += c + 1
        if total > 255 or len(labels) > 127:
            raise ValueError("name too long")
        labels.append(b[off + 1:off + 1 + c].decode(
            "ascii", "replace"))
        off += 1 + c


def _rdata(b: bytes, off: int, rtype: int, rdlen: int) -> str:
    rd = b[off:off + rdlen]
    if rtype == 1 and rdlen == 4:
        return int_to_ipv4(int.from_bytes(rd, "big"))
    if rtype == 28 and rdlen == 16:
        return int_to_ipv6(int.from_bytes(rd, "big"))
    if rtype in (2, 5, 12):  # NS / CNAME / PTR: a name
        return _name(b, off)[0]
    if rtype == 15 and rdlen >= 3:  # MX: pref + name
        pref = int.from_bytes(rd[:2], "big")
        return f"{pref} {_name(b, off + 2)[0]}"
    if rtype == 16:  # TXT: length-prefixed strings, joined
        parts = []
        p = 0
        while p < len(rd):
            n = rd[p]
            parts.append(rd[p + 1:p + 1 + n].decode(
                "ascii", "replace"))
            p += 1 + n
        return "".join(parts)
    if rtype == 6:  # SOA: mname + serial
        mname, p = _name(b, off)
        _rname, p = _name(b, p)
        if p + 4 <= len(b):
            return f"{mname} {int.from_bytes(b[p:p + 4], 'big')}"
        return mname
    return f"bytes:{rdlen}"


def parse_dns(payload) -> dict:
    """payload -> {"msg": dict|None, "records": [...]}; never
    raises; msg None under 12 bytes, otherwise the header parses
    and records accumulate until the first malformed byte — corpus
    audits need to see partial messages, not lose them. Record row:
    (pos, section, name, rtype, ttl, rdata) — questions carry NULL
    ttl/rdata."""
    out: dict = {"msg": None, "records": []}
    if not isinstance(payload, (bytes, bytearray)) or \
            len(payload) < 12:
        return out
    b = bytes(payload)
    flags = int.from_bytes(b[2:4], "big")
    counts = [int.from_bytes(b[i:i + 2], "big")
              for i in (4, 6, 8, 10)]
    out["msg"] = {
        "msg_id": int.from_bytes(b[0:2], "big"),
        "is_response": bool(flags & 0x8000),
        "opcode": _OPCODES.get((flags >> 11) & 0xF,
                               str((flags >> 11) & 0xF)),
        "authoritative": bool(flags & 0x0400),
        "truncated": bool(flags & 0x0200),
        "recursion_desired": bool(flags & 0x0100),
        "rcode": _RCODES.get(flags & 0xF, str(flags & 0xF)),
        "qdcount": counts[0], "ancount": counts[1],
        "nscount": counts[2], "arcount": counts[3],
    }
    off = 12
    pos = 0
    try:
        for _ in range(min(counts[0], 1000)):
            name, off = _name(b, off)
            if off + 4 > len(b):
                raise ValueError("question overrun")
            qtype = int.from_bytes(b[off:off + 2], "big")
            off += 4
            out["records"].append(
                (pos, "question", name,
                 _TYPES.get(qtype, str(qtype)), None, None))
            pos += 1
        for section, cnt in (("answer", counts[1]),
                             ("authority", counts[2]),
                             ("additional", counts[3])):
            for _ in range(min(cnt, 1000)):
                name, off = _name(b, off)
                if off + 10 > len(b):
                    raise ValueError("rr overrun")
                rtype = int.from_bytes(b[off:off + 2], "big")
                ttl = int.from_bytes(b[off + 4:off + 8], "big")
                rdlen = int.from_bytes(b[off + 8:off + 10], "big")
                off += 10
                if off + rdlen > len(b):
                    raise ValueError("rdata overrun")
                rdata = _rdata(b, off, rtype, rdlen)
                off += rdlen
                out["records"].append(
                    (pos, section, name,
                     _TYPES.get(rtype, str(rtype)), ttl, rdata))
                pos += 1
    except ValueError:
        pass
    return out
