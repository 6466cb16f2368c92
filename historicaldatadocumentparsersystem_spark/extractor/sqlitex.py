"""SQLite database-file reader — pure Python, from scratch over the
published file format (sqlite.org/fileformat2), Spark-free.

Embedded .sqlite/.db files show up constantly in crawled archives
(app bundles, datasets, browser profiles inside zips); the engine's
view is INDEX-SHAPED, like ``parquetx``/``zipx``: the 100-byte
header, the ``sqlite_master`` catalog (type/name/tbl_name/rootpage/
sql), and an exact per-table row count from walking each table's
b-tree — never a SQL engine. stdlib ``sqlite3`` is the free pytest
oracle (the ``zipx``/``zipfile`` pattern): both sides read the SAME
committed bytes, so parity is independent of the library version
that built the fixtures.

Spec surface covered: big-endian varints (9th byte uses all 8
bits), table-leaf/interior and index-leaf/interior pages, the
local-payload/overflow split (minLocal/maxLocal formulas differ for
table vs index trees), overflow-page chains, record serial types
(0-9, blobs, text in the header-declared encoding: utf8/utf16le/
utf16be), and WITHOUT ROWID tables (index-tree roots: rows live in
interior AND leaf cells). Cycle/corruption guards everywhere — a
malformed file degrades to header-only or no rows, never raises.

Reference anchor: the reference ingests documents via source
connectors (doc_processor.py); a database-file connector is the
same "opaque container -> typed rows" move its CSV/PDF paths make.
"""

from __future__ import annotations

import struct

_MAGIC = b"SQLite format 3\x00"
_ENC = {1: "utf8", 2: "utf16le", 3: "utf16be"}
_CODEC = {"utf8": "utf-8", "utf16le": "utf-16-le",
          "utf16be": "utf-16-be"}


def _u16(b: bytes, off: int) -> int:
    return int.from_bytes(b[off:off + 2], "big")


def _u32(b: bytes, off: int) -> int:
    return int.from_bytes(b[off:off + 4], "big")


def _varint(b: bytes, off: int) -> tuple[int, int]:
    """(value, next_off); SQLite big-endian varint, at most 9 bytes
    (the 9th contributes all 8 bits). Raises IndexError past EOF —
    callers catch."""
    v = 0
    for i in range(8):
        c = b[off + i]
        v = (v << 7) | (c & 0x7F)
        if not c & 0x80:
            return v, off + i + 1
    return (v << 8) | b[off + 8], off + 9


def parse_header(payload: bytes) -> dict | None:
    """100-byte header -> dict, or None if not an SQLite file."""
    if not isinstance(payload, (bytes, bytearray)) or \
            len(payload) < 100 or payload[:16] != _MAGIC:
        return None
    b = bytes(payload)
    ps = _u16(b, 16)
    if ps == 1:
        ps = 65536
    if ps < 512 or ps & (ps - 1):
        return None
    reserved = b[20]
    usable = ps - reserved
    if usable < 480:
        return None
    # size-in-pages header field is valid only when the change
    # counter matches version-valid-for; else derive from file size
    n_pages = _u32(b, 28)
    if n_pages == 0 or _u32(b, 24) != _u32(b, 92):
        n_pages = len(b) // ps
    fp = _u32(b, 36)
    return {
        "page_size": ps,
        "usable": usable,
        "n_pages": n_pages,
        # Int32-column clamp rule: a u32 header field past int32
        # range is garbage — surface NULL, never crash the batch
        "freelist_pages": fp if fp <= 0x7FFFFFFF else None,
        "schema_cookie": _u32(b, 40),
        "encoding": _ENC.get(_u32(b, 56)),
        "user_version": _u32(b, 60),
        "application_id": _u32(b, 68),
    }


class _Db:
    def __init__(self, payload: bytes, hdr: dict):
        self.b = payload
        self.ps = hdr["page_size"]
        self.usable = hdr["usable"]
        self.n_pages = min(hdr["n_pages"], len(payload) // self.ps)
        self.enc = _CODEC.get(hdr["encoding"] or "", "utf-8")

    def page(self, num: int) -> bytes | None:
        if num < 1 or num > self.n_pages:
            return None
        return self.b[(num - 1) * self.ps: num * self.ps]

    # --- local-payload split (fileformat2 §B-tree Pages) ---------
    def _local(self, payload_len: int, index_tree: bool) -> int:
        u = self.usable
        max_local = (u - 12) * 64 // 255 - 23 if index_tree \
            else u - 35
        if payload_len <= max_local:
            return payload_len
        min_local = (u - 12) * 32 // 255 - 23
        k = min_local + (payload_len - min_local) % (u - 4)
        return k if k <= max_local else min_local

    def _payload(self, page: bytes, off: int, plen: int,
                 index_tree: bool) -> bytes | None:
        """Assemble a cell payload, following the overflow chain."""
        local = self._local(plen, index_tree)
        if off + local > len(page):
            return None
        out = bytearray(page[off:off + local])
        if local < plen:
            if off + local + 4 > len(page):
                return None
            nxt = _u32(page, off + local)
            seen = set()
            while nxt and len(out) < plen:
                if nxt in seen:
                    return None
                seen.add(nxt)
                op = self.page(nxt)
                if op is None or len(op) < 4:
                    return None
                take = min(self.usable - 4, plen - len(out))
                out += op[4:4 + take]
                nxt = _u32(op, 0)
            if len(out) < plen:
                return None
        return bytes(out[:plen])

    def _decode_record(self, rec: bytes) -> list | None:
        """SQLite record -> python values (None/int/float/str/bytes)."""
        try:
            hlen, off = _varint(rec, 0)
            if hlen < 1 or hlen > len(rec):
                return None
            serials = []
            while off < hlen:
                s, off = _varint(rec, off)
                serials.append(s)
            vals = []
            pos = hlen
            for s in serials:
                if s == 0:
                    vals.append(None)
                elif 1 <= s <= 6:
                    n = (1, 2, 3, 4, 6, 8)[s - 1]
                    vals.append(int.from_bytes(
                        rec[pos:pos + n], "big", signed=True))
                    pos += n
                elif s == 7:
                    if pos + 8 > len(rec):
                        return None
                    vals.append(struct.unpack(
                        ">d", rec[pos:pos + 8])[0])
                    pos += 8
                elif s == 8:
                    vals.append(0)
                elif s == 9:
                    vals.append(1)
                elif s >= 12 and s % 2 == 0:
                    n = (s - 12) // 2
                    vals.append(rec[pos:pos + n])
                    pos += n
                elif s >= 13:
                    n = (s - 13) // 2
                    vals.append(rec[pos:pos + n].decode(
                        self.enc, "replace"))
                    pos += n
                else:  # 10/11 reserved
                    return None
                if pos > len(rec):
                    return None
            return vals
        except (IndexError, ValueError, struct.error):
            return None

    # --- tree walks ----------------------------------------------
    def _page_cells(self, num: int) -> tuple[int, bytes, list[int]]:
        """(page_type, page_bytes, cell_offsets); type 0 on error."""
        pg = self.page(num)
        if pg is None:
            return 0, b"", []
        hoff = 100 if num == 1 else 0
        if hoff >= len(pg):
            return 0, b"", []
        ptype = pg[hoff]
        if ptype not in (2, 5, 10, 13):
            return 0, b"", []
        ncells = _u16(pg, hoff + 3)
        hsize = 12 if ptype in (2, 5) else 8
        base = hoff + hsize
        offs = []
        for i in range(ncells):
            p = base + 2 * i
            if p + 2 > len(pg):
                break
            o = _u16(pg, p)
            if 0 < o < len(pg):
                offs.append(o)
        return ptype, pg, offs

    def table_rows(self, root: int, decode: bool = False,
                   max_pages: int = 100_000):
        """Iterate a table b-tree's leaf cells. Yields decoded
        record value-lists when decode=True, else 1 per row.
        Auto-detects WITHOUT ROWID roots (index trees: every cell
        on every level is a row)."""
        first = self._page_cells(root)[0]
        index_tree = first in (2, 10)
        stack = [root]
        seen: set[int] = set()
        while stack:
            num = stack.pop()
            if num in seen or len(seen) > max_pages:
                return
            seen.add(num)
            ptype, pg, offs = self._page_cells(num)
            hoff = 100 if num == 1 else 0
            if ptype in (2, 5):  # interior
                stack.append(_u32(pg, hoff + 8))  # rightmost
                for o in offs:
                    if o + 4 <= len(pg):
                        stack.append(_u32(pg, o))
            if index_tree:
                emit_offs = offs if ptype in (2, 10) else []
                child_skip = 4 if ptype == 2 else 0
            else:
                emit_offs = offs if ptype == 13 else []
                child_skip = 0
            for o in emit_offs:
                try:
                    p = o + child_skip
                    plen, p = _varint(pg, p)
                    if not index_tree:
                        _rowid, p = _varint(pg, p)
                    if not decode:
                        yield 1
                        continue
                    raw = self._payload(pg, p, plen, index_tree)
                    if raw is None:
                        continue
                    vals = self._decode_record(raw)
                    if vals is not None:
                        yield vals
                except (IndexError, ValueError):
                    continue


def parse_sqlite(payload) -> dict:
    """payload -> {"header": dict|None, "objects": [...]}; never
    raises; objects empty for junk. Object row: (pos, otype, name,
    tbl_name, rootpage, sql, n_rows) in sqlite_master order —
    n_rows is the exact b-tree row count for tables (NULL for
    rootpage-0 objects: views, triggers, virtual tables)."""
    out: dict = {"header": None, "objects": []}
    if isinstance(payload, (bytes, bytearray)):
        payload = bytes(payload)
    else:
        return out
    hdr = parse_header(payload)
    if hdr is None:
        return out
    out["header"] = hdr
    db = _Db(payload, hdr)
    pos = 0
    for vals in db.table_rows(1, decode=True):
        if len(vals) < 5:
            continue
        otype, name, tbl_name, rootpage, sql = vals[:5]
        if not isinstance(otype, str) or not isinstance(name, str):
            continue
        rootpage = rootpage if isinstance(rootpage, int) \
            and 0 <= rootpage <= 0x7FFFFFFF else None
        sql = sql if isinstance(sql, str) else None
        n_rows = None
        if otype == "table" and rootpage:
            n_rows = sum(1 for _ in db.table_rows(rootpage))
        out["objects"].append(
            (pos, otype, name,
             tbl_name if isinstance(tbl_name, str) else None,
             rootpage, sql, n_rows))
        pos += 1
    return out
