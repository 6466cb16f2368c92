"""Git object-store reader — pure Python, from scratch over the
published pack/loose formats (git's Documentation/gitformat-pack),
Spark-free.

Exposed ``.git`` directories are a classic crawl corpus; the
engine's view is INDEX-SHAPED: every object's type, size, packed
extent, and REAL object id (SHA-1 over ``"<type> <size>\\0"`` +
content — stdlib hashlib), with commits parsed into their graph
fields (tree, parents, author/committer identity + timestamp,
title line) and trees into their entry tables. Pack deltas are
APPLIED, not skipped: ofs-delta base-offset varints and the
copy/insert instruction stream are implemented, so delta'd objects
resolve to their true type/content like git does.

Loose objects are single zlib streams; packs are
``PACK``+version+count then per-object headers (3-bit type,
size varint) + zlib streams sized via decompressobj consumption.
A malformed object ends the walk, keeping resolved objects.
"""

from __future__ import annotations

import hashlib
import zlib

from .compx import inflate_bounded

_TYPES = {1: "commit", 2: "tree", 3: "blob", 4: "tag"}
_MAX_LOOSE = 1 << 26   # 64 MB loose-object inflate cap
_MAX_PACKED = 1 << 31  # declared pack-object size sanity bound


def _obj_id(otype: str, content: bytes) -> str:
    h = hashlib.sha1()
    h.update(f"{otype} {len(content)}".encode() + b"\x00"
             + content)
    return h.hexdigest()


def _apply_delta(base: bytes, delta: bytes) -> bytes | None:
    def size(p):
        v = shift = 0
        while True:
            if p >= len(delta):
                raise ValueError
            c = delta[p]
            v |= (c & 0x7F) << shift
            p += 1
            if not c & 0x80:
                return v, p
            shift += 7
    try:
        src_size, p = size(0)
        if src_size != len(base):
            return None
        out_size, p = size(p)
        if out_size > _MAX_PACKED:
            return None
        out = bytearray()
        while p < len(delta):
            if len(out) > out_size:  # copy-op expansion bomb
                return None
            op = delta[p]
            p += 1
            if op & 0x80:  # copy from base
                off = sz = 0
                for i in range(4):
                    if op & (1 << i):
                        off |= delta[p] << (8 * i)
                        p += 1
                for i in range(3):
                    if op & (0x10 << i):
                        sz |= delta[p] << (8 * i)
                        p += 1
                if sz == 0:
                    sz = 0x10000
                if off + sz > len(base):
                    return None
                out += base[off:off + sz]
            elif op:  # insert literal
                out += delta[p:p + op]
                p += op
            else:
                return None
        return bytes(out) if len(out) == out_size else None
    except (ValueError, IndexError):
        return None


def parse_commit(content: bytes) -> dict:
    """commit object content -> {tree, parents, author_email,
    author_ts, committer_email, title}."""
    out: dict = {"tree": None, "parents": [],
                 "author_email": None, "author_ts": None,
                 "committer_email": None, "title": None}
    head, _, msg = content.partition(b"\n\n")
    for line in head.split(b"\n"):
        if line.startswith(b"tree "):
            out["tree"] = line[5:].decode("ascii", "replace")
        elif line.startswith(b"parent "):
            out["parents"].append(
                line[7:].decode("ascii", "replace"))
        elif line.startswith((b"author ", b"committer ")):
            kind = "author" if line.startswith(b"author ") \
                else "committer"
            try:
                lt = line.index(b"<")
                gt = line.index(b">", lt)
                email = line[lt + 1:gt].decode("utf-8", "replace")
                rest = line[gt + 1:].split()
                # 1-15-digit trust gate (the delta-seconds rule):
                # unbounded int() would overflow the Int64 column
                ts = int(rest[0]) if rest \
                    and rest[0].lstrip(b"-").isdigit() \
                    and len(rest[0]) <= 15 else None
            except (ValueError, IndexError):
                email, ts = None, None
            out[f"{kind}_email"] = email
            if kind == "author":
                out["author_ts"] = ts
    out["title"] = msg.split(b"\n", 1)[0].decode(
        "utf-8", "replace") or None
    return out


def parse_tree(content: bytes) -> list[tuple]:
    """tree object content -> [(mode, name, sha_hex)]."""
    out = []
    p = 0
    while p < len(content):
        sp = content.find(b" ", p)
        nul = content.find(b"\x00", p)
        if sp < 0 or nul < 0 or nul + 21 > len(content):
            break
        mode = content[p:sp].decode("ascii", "replace")
        name = content[sp + 1:nul].decode("utf-8", "replace")
        sha = content[nul + 1:nul + 21].hex()
        out.append((mode, name, sha))
        p = nul + 21
    return out


def parse_loose(payload) -> dict | None:
    """zlib loose object -> {"otype", "size", "oid", "content"};
    None for junk."""
    if not isinstance(payload, (bytes, bytearray)):
        return None
    try:
        raw, _ = inflate_bounded(bytes(payload), 0, _MAX_LOOSE)
    except (zlib.error, ValueError):
        return None
    nul = raw.find(b"\x00")
    if nul < 0:
        return None
    try:
        otype, size_s = raw[:nul].decode("ascii").split(" ")
        size = int(size_s)
    except (ValueError, UnicodeDecodeError):
        return None
    content = raw[nul + 1:]
    if otype not in ("commit", "tree", "blob", "tag") or \
            size != len(content):
        return None
    return {"otype": otype, "size": size,
            "oid": _obj_id(otype, content), "content": content}


def parse_pack(payload, with_content: bool = False) -> dict:
    """packfile -> {"version": int|None, "n_declared": int|None,
    "objects": [(pos, otype, size, packed_size, oid, delta_of)],
    "contents": {oid: bytes} (only when with_content)}; never
    raises. Deltas are applied (ofs-delta and ref-delta), so
    oid/type are the RESOLVED ones; delta_of is the base oid (None
    for non-delta). Objects whose delta cannot resolve carry otype
    'delta' and NULL oid."""
    out: dict = {"version": None, "n_declared": None,
                 "objects": [], "contents": {}}
    if not isinstance(payload, (bytes, bytearray)) or \
            len(payload) < 12 or payload[:4] != b"PACK":
        return out
    b = bytes(payload)
    out["version"] = int.from_bytes(b[4:8], "big")
    n = int.from_bytes(b[8:12], "big")
    out["n_declared"] = n
    off = 12
    by_off: dict[int, tuple] = {}  # obj_start -> (otype, content)
    by_oid: dict[str, tuple] = {}  # oid -> same (O(1) ref-delta)
    for _ in range(min(n, 10_000)):
        start = off
        try:
            c = b[off]
            off += 1
            t = (c >> 4) & 7
            size = c & 15
            shift = 4
            while c & 0x80:
                c = b[off]
                off += 1
                size |= (c & 0x7F) << shift
                shift += 7
            if size > _MAX_PACKED:
                break
            base_off = None
            base_oid = None
            if t == 6:  # ofs-delta: negative offset varint
                c = b[off]
                off += 1
                rel = c & 0x7F
                while c & 0x80:
                    c = b[off]
                    off += 1
                    rel = ((rel + 1) << 7) | (c & 0x7F)
                base_off = start - rel
            elif t == 7:  # ref-delta
                base_oid = b[off:off + 20].hex()
                off += 20
            # bound by the header's declared size — corrupt sizes
            # and decompression bombs never materialize
            data, consumed = inflate_bounded(b, off, size)
            if len(data) != size:
                break
            off += consumed
            if t in _TYPES:
                otype = _TYPES[t]
                content = data
            else:
                base = by_off.get(base_off) if t == 6 \
                    else by_oid.get(base_oid)
                if base is not None:
                    resolved = _apply_delta(base[1], data)
                else:
                    resolved = None
                if resolved is None:
                    out["objects"].append(
                        (len(out["objects"]), "delta", len(data),
                         off - start, None,
                         base_oid))
                    continue
                otype, content = base[0], resolved
                base_oid = _obj_id(*base)
            by_off[start] = (otype, content)
            oid = _obj_id(otype, content)
            by_oid[oid] = by_off[start]
            if with_content:
                out["contents"][oid] = content
            out["objects"].append(
                (len(out["objects"]), otype, len(content),
                 off - start, oid,
                 base_oid if t in (6, 7) else None))
        except (IndexError, ValueError, zlib.error):
            break
    return out
