"""Libpcap capture-file reader — pure Python, from scratch over the
published format (the classic 24-byte global header + per-record
framing; both byte orders, micro- and nanosecond magics), Spark-free.

Network captures are the wire-side complement of ``accesslogx``
(server side) and ``harx`` (browser side): the engine's view is
INDEX-SHAPED — one row per packet with exact integer epoch-ms
timestamps (sec*1000 + frac//10^k, the gpxx/cachex epoch rule — no
float time anywhere), link/network/transport header fields, and
NULLs from the first undecodable layer down. Payloads are never
inspected.

Layers covered: Ethernet (linktype 1, 802.1Q VLAN unwrap) and raw
IP (linktype 101); IPv4 (IHL-aware) and IPv6 (fixed 40-byte header;
extension headers stop transport decode — surfaced as the raw
next-header number); TCP (ports + SYN/ACK/FIN/RST flags), UDP
(ports), ICMP. IPv6 text is RFC 5952 canonical via
``ipx.int_to_ipv6`` (stdlib-pinned). A truncated record ends the
walk; parsed packets survive.
"""

from __future__ import annotations

from .ipx import int_to_ipv4, int_to_ipv6

_MAGICS = {
    0xA1B2C3D4: ("big", 1000),      # seconds + microseconds
    0xD4C3B2A1: ("little", 1000),
    0xA1B23C4D: ("big", 1000000),   # seconds + nanoseconds
    0x4D3CB2A1: ("little", 1000000),
}
_PROTO = {1: "icmp", 6: "tcp", 17: "udp", 58: "icmpv6"}


def _mac(b: bytes) -> str:
    return ":".join(f"{c:02x}" for c in b)


def _ipv4(b: bytes, row: dict) -> None:
    if len(b) < 20 or b[0] >> 4 != 4:
        return
    ihl = (b[0] & 0x0F) * 4
    if ihl < 20 or len(b) < ihl:
        return
    proto = b[9]
    row["src_ip"] = int_to_ipv4(int.from_bytes(b[12:16], "big"))
    row["dst_ip"] = int_to_ipv4(int.from_bytes(b[16:20], "big"))
    row["proto"] = _PROTO.get(proto, str(proto))
    _transport(b[ihl:], proto, row)


def _ipv6(b: bytes, row: dict) -> None:
    if len(b) < 40 or b[0] >> 4 != 6:
        return
    proto = b[6]
    row["src_ip"] = int_to_ipv6(int.from_bytes(b[8:24], "big"))
    row["dst_ip"] = int_to_ipv6(int.from_bytes(b[24:40], "big"))
    row["proto"] = _PROTO.get(proto, str(proto))
    _transport(b[40:], proto, row)


def _transport(b: bytes, proto: int, row: dict) -> None:
    if proto == 6 and len(b) >= 14:
        row["src_port"] = int.from_bytes(b[0:2], "big")
        row["dst_port"] = int.from_bytes(b[2:4], "big")
        fl = b[13]
        row["tcp_flags"] = "".join(
            ch for ch, bit in (("F", 1), ("S", 2), ("R", 4),
                               ("P", 8), ("A", 16), ("U", 32))
            if fl & bit)
    elif proto == 17 and len(b) >= 8:
        row["src_port"] = int.from_bytes(b[0:2], "big")
        row["dst_port"] = int.from_bytes(b[2:4], "big")


def parse_pcap(payload) -> dict:
    """payload -> {"linktype": int|None, "nano": bool|None,
    "packets": [dict]}; never raises; empty for junk. Packet dict:
    pos, ts_ms (exact integer epoch millis), orig_len, incl_len,
    src_mac/dst_mac (Ethernet only), ethertype, src_ip, dst_ip,
    proto, src_port, dst_port, tcp_flags — NULL from the first
    layer the snaplen/linktype can't decode."""
    out: dict = {"linktype": None, "nano": None, "packets": []}
    if not isinstance(payload, (bytes, bytearray)) or \
            len(payload) < 24:
        return out
    b = bytes(payload)
    magic = int.from_bytes(b[:4], "big")
    if magic not in _MAGICS:
        return out
    endian, div = _MAGICS[magic]
    linktype = int.from_bytes(b[20:24], endian)
    out["linktype"] = linktype
    out["nano"] = div == 1000000
    off = 24
    pos = 0
    while off + 16 <= len(b) and pos < 100_000:
        ts_sec = int.from_bytes(b[off:off + 4], endian)
        ts_frac = int.from_bytes(b[off + 4:off + 8], endian)
        incl = int.from_bytes(b[off + 8:off + 12], endian)
        orig = int.from_bytes(b[off + 12:off + 16], endian)
        off += 16
        if incl > 0x7FFFFFFF or off + incl > len(b):
            break
        pkt = b[off:off + incl]
        off += incl
        row: dict = {"pos": pos, "ts_ms": ts_sec * 1000
                     + ts_frac // div,
                     # Int32-column clamp: orig_len is a raw u32
                     # the framing never validates — NULL past int32
                     "orig_len": orig if orig <= 0x7FFFFFFF
                     else None,
                     "incl_len": incl,
                     "src_mac": None, "dst_mac": None,
                     "ethertype": None, "src_ip": None,
                     "dst_ip": None, "proto": None,
                     "src_port": None, "dst_port": None,
                     "tcp_flags": None}
        pos += 1
        if linktype == 1 and len(pkt) >= 14:     # Ethernet
            row["dst_mac"] = _mac(pkt[0:6])
            row["src_mac"] = _mac(pkt[6:12])
            et = int.from_bytes(pkt[12:14], "big")
            net = pkt[14:]
            if et == 0x8100 and len(pkt) >= 18:  # 802.1Q unwrap
                et = int.from_bytes(pkt[16:18], "big")
                net = pkt[18:]
            row["ethertype"] = et
            if et == 0x0800:
                _ipv4(net, row)
            elif et == 0x86DD:
                _ipv6(net, row)
        elif linktype == 101 and pkt:            # raw IP
            if pkt[0] >> 4 == 4:
                _ipv4(pkt, row)
            elif pkt[0] >> 4 == 6:
                _ipv6(pkt, row)
        out["packets"].append(row)
    return out
