"""pdfminer-style layout pass for a controlled PDF subset (pure Python).

The environment ships no pdfminer.six (SURVEY.md §7.0), so this targets
the subset our fixture generator synthesizes: content streams with
``BT/ET`` text objects, ``Tj``/``TJ`` show-text and ``Td/TD/T*``
positioning — stored raw or behind the standard stream filters:
``/FlateDecode`` (zlib, the near-universal real-world encoding),
``/LZWDecode`` (the pre-Flate legacy encoding, implemented from the
PDF/TIFF spec with EarlyChange=1 — the width-bump rule matches
pdfminer's decoder), ``/RunLengthDecode`` (PackBits-style byte runs,
PDF 7.4.5), ``/ASCIIHexDecode`` and ``/ASCII85Decode``
(transport armors, stdlib binascii/base64), including filter CHAINS
(``/Filter [/ASCII85Decode /FlateDecode]`` applies left-to-right). A
stream with an unsupported filter or a corrupt body is skipped —
degrade, never raise (F5 gate).
One content stream == one page; one string literal == one output line
(the fixtures emit one ``Tj`` per line).

This generalizes the reference's PDF sources S2/S3
(``docling_chunker.py:38-58``, ``unstructured_chunker.py:124-133``):
parse a binary document into ordered layout elements with page
provenance, reassemble reading-order text with "\\n"
(``base_parser.py:42``).

Stream framing: each ``<< ... >> stream`` header is located by a flat
(non-nested) dict scan; ``/Length`` slices the body exactly when
present, else the body runs to the next ``endstream``. A dict that
nests another dict (``/DecodeParms << ... >>``), an unsupported
filter, or a body that fails to decode skips that stream — degrade,
never raise (F5 gate).

Offsets: the payload is decoded latin-1 (1 byte == 1 char), so each
span's ``(start, end)`` indexes the interior of the string literal in
the decoded payload; when the literal contains no escapes the verbatim
invariant ``text == src[start:end]`` holds (our fixtures guarantee it;
escaped literals are still decoded correctly, their spans simply cover
the raw escaped form). For filtered streams no payload position
exists: spans index the DECODED content stream instead (page-local),
same structural shape either way.
"""

from __future__ import annotations

import base64
import binascii
import re
import zlib

_STREAM_HDR_RE = re.compile(rb"<<(?P<dict>[^<]*)>>\s*stream\r?\n")
_LEN_RE = re.compile(rb"/Length\s+(\d+)")
# /Filter with a single name or an array of names (applied in order)
_FILTER_RE = re.compile(
    rb"/Filter\s*(?:\[(?P<arr>[^\]]*)\]|(?P<one>/[A-Za-z0-9]+))")
_NAME_RE = re.compile(rb"/([A-Za-z0-9]+)")
_TEXTOBJ_RE = re.compile(r"BT(.*?)ET", re.S)
# string literal (no nested parens in our subset, escaped chars allowed)
_LIT = r"\((?:[^()\\]|\\.)*\)"
# hex string <48656C6C6F> — the other PDF string form, ubiquitous in
# real-world TJ arrays emitted by font subsetters
_HEX = r"<[0-9A-Fa-f\s]*>"
_SHOW_RE = re.compile(
    rf"(?P<lit>{_LIT}|{_HEX})\s*Tj"     # (text) Tj  /  <hex> Tj
    rf"|\[(?P<arr>(?:{_LIT}|{_HEX}|[-\d.\s])*)\]\s*TJ",
    re.S,
)
_LIT_RE = re.compile(rf"{_LIT}|{_HEX}", re.S)

_ESCAPES = {
    "n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f",
    "(": "(", ")": ")", "\\": "\\",
}


def _unescape(raw: str) -> str:
    # fast path: most show-string literals carry no escape at all
    if "\\" not in raw:
        return raw
    out: list[str] = []
    i, n = 0, len(raw)
    while i < n:
        # copy the run up to the next backslash in one slice
        j = raw.find("\\", i)
        if j == -1 or j == n - 1:
            out.append(raw[i:])   # a trailing lone backslash is kept
            break
        if j > i:
            out.append(raw[i:j])
        i = j
        nxt = raw[i + 1]
        if nxt in _ESCAPES:
            out.append(_ESCAPES[nxt])
            i += 2
            continue
        if nxt.isdigit():  # octal \ooo (1-3 digits)
            j = i + 1
            while j < min(i + 4, n) and raw[j].isdigit():
                j += 1
            out.append(chr(int(raw[i + 1:j], 8) & 0xFF))
            i = j
            continue
        i += 1  # line continuation / unknown escape: drop backslash
    return "".join(out)


def _asciihex_decode(body: bytes) -> bytes:
    """/ASCIIHexDecode: hex digits (whitespace ignored) up to the ``>``
    EOD marker; an odd trailing digit is padded with 0 (PDF 7.4.2)."""
    s = body.split(b">")[0]
    s = b"".join(s.split())
    if len(s) % 2:
        s += b"0"
    return binascii.unhexlify(s)


def _ascii85_decode(body: bytes) -> bytes:
    """/ASCII85Decode: Adobe ascii85 up to the ``~>`` EOD marker
    (``z`` zero-group shorthand supported via the stdlib adobe mode)."""
    s = body.split(b"~>")[0]
    s = b"".join(s.split())
    if s.startswith(b"<~"):
        s = s[2:]
    return base64.a85decode(b"<~" + s + b"~>", adobe=True)


def _lzw_decode(data: bytes) -> bytes:
    """/LZWDecode (PDF 7.4.4 == TIFF LZW), EarlyChange=1: variable
    9->12-bit codes MSB-first, 256=clear-table, 257=EOD. The decoder
    widens one entry EARLIER than the encoder assigns (next_code ==
    2^w - 2) — the early-change convention, same rule as pdfminer's
    LZWDecoder — and stops assigning at 4095, where a conforming
    encoder emits a clear code instead."""
    out = bytearray()
    base = {i: bytes([i]) for i in range(256)}
    table = dict(base)
    next_code, width = 258, 9
    prev: bytes | None = None
    bitbuf = nbits = 0
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                table = dict(base)
                next_code, width, prev = 258, 9, None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
                if next_code < 4095:
                    table[next_code] = prev + entry[:1]
                    next_code += 1
            elif code == next_code:
                entry = prev + prev[:1]
                if next_code < 4095:
                    table[next_code] = entry
                    next_code += 1
            else:
                raise ValueError("corrupt LZW stream")
            out += entry
            prev = entry
            if next_code >= (1 << width) - 2 and width < 12:
                width += 1
    return bytes(out)


def _runlength_decode(data: bytes) -> bytes:
    """/RunLengthDecode (PDF 7.4.5): a length byte L, then either
    L+1 literal bytes (L <= 127) or one byte repeated 257-L times
    (L >= 129); 128 is EOD. A truncated run is corrupt."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        length = data[i]
        if length == 128:
            return bytes(out)
        if length <= 127:
            j = i + 1 + length + 1
            if j > n:
                raise ValueError("truncated RunLength literal run")
            out += data[i + 1:j]
            i = j
        else:
            if i + 1 >= n:
                raise ValueError("truncated RunLength repeat run")
            out += bytes([data[i + 1]]) * (257 - length)
            i += 2
    return bytes(out)


_DECODERS = {
    b"FlateDecode": zlib.decompress,
    b"LZWDecode": _lzw_decode,
    b"RunLengthDecode": _runlength_decode,
    b"ASCIIHexDecode": _asciihex_decode,
    b"ASCII85Decode": _ascii85_decode,
}


def _stream_filters(sdict: bytes) -> list[bytes] | None:
    """Filter-name chain from a stream dict, in application order.
    ``[]`` = raw stream; ``None`` = has a filter we cannot decode."""
    fm = _FILTER_RE.search(sdict)
    if fm is None:
        return []
    names = (_NAME_RE.findall(fm.group("arr"))
             if fm.group("arr") is not None
             else [fm.group("one")[1:]])
    return names if all(n in _DECODERS for n in names) else None


def iter_content_streams(payload: bytes):
    """Yield ``(body_start, body_bytes, filtered)`` per content stream.

    ``/Length`` slices the body exactly when present; otherwise the
    body runs to the next ``endstream`` (trailing EOL stripped).
    Filtered bodies arrive DECODED (the ``/Filter`` chain applied
    left-to-right) with ``filtered=True``; a stream with an unknown
    filter or a body that fails to decode is skipped (degrade, never
    raise). The header scan resumes past each body, so encoded bytes
    can never be misread as a stream header.
    """
    pos = 0
    while True:
        sm = _STREAM_HDR_RE.search(payload, pos)
        if sm is None:
            return
        sdict = sm.group("dict")
        body_start = sm.end()
        mlen = _LEN_RE.search(sdict)
        if mlen is not None:
            body = payload[body_start:body_start + int(mlen.group(1))]
        else:
            end = payload.find(b"endstream", body_start)
            if end < 0:
                return
            body = payload[body_start:end]
            if body.endswith(b"\r\n"):
                body = body[:-2]
            elif body.endswith(b"\n"):
                body = body[:-1]
        pos = body_start + len(body)
        filters = _stream_filters(sdict)
        if filters is None:
            continue  # unsupported filter: skip the stream
        try:
            for name in filters:
                body = _DECODERS[name](body)
        except Exception:
            continue  # corrupt stream: skip it, never raise
        yield body_start, body, bool(filters)


# --- modern PDFs: object streams + cross-reference streams --------------------
# PDF 1.5+ packs non-stream objects into /Type/ObjStm streams and
# replaces the classic trailer with a /Type/XRef stream whose DICT
# carries /Root and /Info (7.5.7-7.5.8). The readers below stay
# xref-free: embedded objects are EXPANDED into synthetic classic
# "N 0 obj ... endobj" blocks appended after the payload (document
# order, so last-wins incremental semantics are preserved), and the
# trailer scan walks classic trailer blocks AND XRef stream dicts in
# position order.

_OBJSTM_TYPE_RE = re.compile(rb"/Type\s*/ObjStm(?![\w])")
_XREF_TYPE_RE = re.compile(rb"/Type\s*/XRef(?![\w])")
_INT_RE = re.compile(rb"\d+")
_STREAM_KW_RE = re.compile(rb"\s*stream\r?\n")


def _objstm_field(sdict: bytes, key: bytes) -> int | None:
    m = re.search(rb"/" + key + rb"\s+(\d+)", sdict)
    return int(m.group(1)) if m else None


def _scan_dict(payload: bytes, start: int) -> int | None:
    """``start`` at a ``<<``; return the index just past the matching
    ``>>``, honoring nested dicts, hex strings (``<...>``) and
    escape-aware literal strings — real xref/ObjStm dicts carry
    ``/ID [<hex> <hex>]`` and ``/DecodeParms << ... >>``, which the
    simple content-stream regex cannot (the r4 trailer lesson)."""
    i, depth, n = start, 0, len(payload)
    while i < n:
        two = payload[i:i + 2]
        if two == b"<<":
            depth += 1
            i += 2
        elif two == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return i
        elif payload[i:i + 1] == b"<":
            j = payload.find(b">", i + 1)
            if j < 0:
                return None
            i = j + 1
        elif payload[i:i + 1] == b"(":
            i += 1
            while i < n:
                c = payload[i:i + 1]
                i += 2 if c == b"\\" else 1
                if c == b")":
                    break
        else:
            i += 1
    return None


def _iter_streams_tolerant(payload: bytes):
    """Yield ``(sdict, body, body_end)`` per stream object with FULL
    dict syntax tolerated (nested dicts, /ID hex strings) — the
    modern-PDF walk; the classic content-stream path keeps its
    committed simple-regex behavior."""
    pos = 0
    n = len(payload)
    while pos < n:
        d0 = payload.find(b"<<", pos)
        if d0 < 0:
            return
        dend = _scan_dict(payload, d0)
        if dend is None:
            return
        m = _STREAM_KW_RE.match(payload, dend)
        if m is None:
            pos = d0 + 2        # also re-enters nested dicts — fine
            continue
        sdict = payload[d0 + 2:dend - 2]
        body_start = m.end()
        mlen = _LEN_RE.search(sdict)
        if mlen is not None:
            body_end = min(body_start + int(mlen.group(1)), n)
        else:
            body_end = payload.find(b"endstream", body_start)
            if body_end < 0:
                return
        yield sdict, payload[body_start:body_end], body_end
        pos = body_end


def expand_object_streams(payload: bytes) -> bytes:
    """Synthetic ``num 0 obj ... endobj`` blocks for every object
    embedded in a /Type/ObjStm stream (decoded via the shared filter
    chain; embedded objects have generation 0 by spec), inserted
    IN PLACE right after their ObjStm — so a later classic
    redefinition from an incremental update still wins at the
    last-match-wins readers. ObjStm-free payloads return the SAME
    object unchanged. Malformed streams are skipped (F5)."""
    inserts: list[tuple[int, bytes]] = []
    for sdict, body, body_end in _iter_streams_tolerant(payload):
        if not _OBJSTM_TYPE_RE.search(sdict):
            continue
        n = _objstm_field(sdict, b"N")
        first = _objstm_field(sdict, b"First")
        filters = _stream_filters(sdict)
        if n is None or first is None or filters is None:
            continue            # unknown filter: skip (F5)
        try:
            for name in filters:
                body = _DECODERS[name](body)
        except Exception:
            continue
        if n > 100_000 or first > len(body):
            continue            # attribute-fed allocation clamp
        ints = [int(x) for x in _INT_RE.findall(body[:first])]
        if len(ints) < 2 * n:
            continue
        pairs = [(ints[2 * i], ints[2 * i + 1]) for i in range(n)]
        blocks = []
        for i, (num, off) in enumerate(pairs):
            lo = first + off
            hi = first + pairs[i + 1][1] if i + 1 < n else len(body)
            if not 0 <= lo <= hi <= len(body):
                continue
            blocks.append(b"%d 0 obj %s endobj"
                          % (num, body[lo:hi].strip()))
        if blocks:
            inserts.append((body_end,
                            b"\n" + b"\n".join(blocks) + b"\n"))
    if not inserts:
        return payload
    out, prev = [], 0
    for at, synth in inserts:
        out.append(payload[prev:at])
        out.append(synth)
        prev = at
    out.append(payload[prev:])
    return b"".join(out)


def _iter_trailer_dicts(payload: bytes):
    """Dict bodies that can carry /Root and /Info, in DOCUMENT order:
    classic ``trailer << ... >>`` blocks and /Type/XRef stream dicts
    (the modern trailer equivalent; full dict syntax tolerated —
    real xref dicts carry /ID and /DecodeParms). Last occurrence
    wins at the callers (incremental updates supersede, 7.5.6)."""
    items = [(m.start(), m.group("d"))
             for m in _TRAILER_RE.finditer(payload)]
    for sdict, _body, body_end in _iter_streams_tolerant(payload):
        if _XREF_TYPE_RE.search(sdict):
            items.append((body_end, sdict))
    items.sort(key=lambda kv: kv[0])
    for _pos, d in items:
        yield d


def extract_pdf(payload: bytes) -> tuple[str, list[tuple[int, int, str]], float]:
    """(extracted_text, spans, score) for a PDF-subset payload.

    spans index into the latin-1 decoded payload for raw streams, or
    the decoded content stream (page-local) for filtered streams;
    kind = ``page<N>``.
    """
    segments: list[tuple[int, int, str]] = []
    texts: list[str] = []
    page = 0
    for body_start, body, filtered in iter_content_streams(payload):
        body_str = body.decode("latin-1")
        if "BT" not in body_str:
            continue
        page += 1
        # char offset == byte offset under latin-1; filtered spans are
        # page-local (index the decoded stream, base 0)
        base = 0 if filtered else body_start
        kind = f"page{page}"
        for tm in _TEXTOBJ_RE.finditer(body_str):
            obj_off = tm.start(1)
            for sh in _SHOW_RE.finditer(tm.group(1)):
                if sh.group("lit") is not None:
                    lits = [(sh.start("lit"), sh.group("lit"))]
                else:
                    lits = [(sh.start("arr") + m.start(), m.group(0))
                            for m in _LIT_RE.finditer(sh.group("arr"))]
                for rel, lit in lits:
                    interior = lit[1:-1]
                    if not interior:
                        continue
                    if lit[0] == "<":
                        # hex string: whitespace ignored, odd trailing
                        # digit padded with 0 (PDF 7.3.4.3); the span
                        # covers the raw hex form (like escaped
                        # literals cover their escaped form)
                        h = "".join(interior.split())
                        if not h:
                            continue
                        decoded = bytes.fromhex(
                            h + "0" if len(h) % 2 else h).decode("latin-1")
                    else:
                        decoded = _unescape(interior)
                    start = base + obj_off + rel + 1
                    segments.append((start, start + len(interior), kind))
                    texts.append(decoded)
    text = "\n".join(texts)
    score = float(page)
    return text, segments, score


# --- document information dictionary (PDF 14.3.3) ----------------------------

INFO_FIELDS = ("title", "author", "subject", "keywords", "creator",
               "producer", "creation_date", "mod_date")

_INFO_KEYS = {b"Title": "title", b"Author": "author",
              b"Subject": "subject", b"Keywords": "keywords",
              b"Creator": "creator", b"Producer": "producer",
              b"CreationDate": "creation_date", b"ModDate": "mod_date"}

_BLIT = rb"\((?:[^()\\]|\\.)*\)"
_BHEX = rb"<[0-9A-Fa-f\s]*>"
# trailer dict content: consume anything up to the FIRST '>>' — a
# lone '>' (the close of a hex string, e.g. the /ID [<...> <...>]
# nearly every real producer writes) must NOT stop the scan
_TRAILER_RE = re.compile(rb"trailer\s*<<(?P<d>(?:[^>]|>(?!>))*)>>",
                         re.S)
_INFO_REF_RE = re.compile(rb"/Info\s+(\d+)\s+(\d+)\s+R")
_BESC_RE = re.compile(rb"\\(\r\n|\r|\n|[0-7]{1,3}|.)", re.S)
_BESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
             b"f": b"\x0c", b"(": b"(", b")": b")", b"\\": b"\\"}
_PDF_DATE_RE = re.compile(
    r"^D:(\d{4})(\d{2})?(\d{2})?(\d{2})?(\d{2})?(\d{2})?"
    r"(?:(Z)|([+\-])(\d{2})(?:'(\d{2})'?)?)?")


def _pdf_string_bytes(tok: bytes) -> bytes:
    """Raw bytes of a PDF string token (literal or hex form)."""
    if tok.startswith(b"("):
        body = tok[1:-1]

        def sub(m: "re.Match[bytes]") -> bytes:
            g = m.group(1)
            if g in (b"\r\n", b"\r", b"\n"):
                return b""          # line continuation
            # octal escape: digits must all be octal — PDF's \8 is
            # just '8' (the regex's [0-7]{1,3} branch guarantees it,
            # but a lone \8 arrives via the '.' branch as a digit)
            if g.isdigit() and not any(c in b"89" for c in g):
                return bytes([int(g, 8) & 0xFF])
            return _BESCAPES.get(g, g)
        return _BESC_RE.sub(sub, body)
    hexs = re.sub(rb"\s", b"", tok[1:-1])
    if len(hexs) % 2:
        hexs += b"0"                # PDF: odd final digit pads with 0
    try:
        return binascii.unhexlify(hexs)
    except binascii.Error:
        return b""


def _pdf_text(tok: bytes) -> str:
    """Decode a PDF text string: UTF-16BE when BOM-prefixed, else the
    latin-1 superset of PDFDocEncoding (exact for the printable ASCII
    range every real producer emits there)."""
    raw = _pdf_string_bytes(tok)
    if raw.startswith(b"\xfe\xff"):
        try:
            return raw[2:].decode("utf-16-be", errors="replace")
        except Exception:
            return ""
    return raw.decode("latin-1")


def pdf_date_to_iso(value: str | None) -> str | None:
    """``D:YYYYMMDDHHmmSS(O HH'mm')`` -> ISO-8601 (spec defaults for
    missing parts: Jan 1, midnight); None when the prefix is absent."""
    if not value:
        return None
    m = _PDF_DATE_RE.match(value.strip())
    if not m:
        return None
    y = m.group(1)
    mo, d, h, mi, s = (m.group(k) or dflt for k, dflt in
                       ((2, "01"), (3, "01"), (4, "00"), (5, "00"),
                        (6, "00")))
    iso = f"{y}-{mo}-{d}T{h}:{mi}:{s}"
    if m.group(7):                  # Z
        return iso + "+00:00"
    if m.group(8):
        return iso + f"{m.group(8)}{m.group(9)}:{m.group(10) or '00'}"
    return iso


def extract_pdf_info(payload: bytes) -> dict | None:
    """The document information dictionary as
    ``{field: str | None for INFO_FIELDS}`` (dates ISO-8601), or None
    when the PDF carries no /Info. Incremental-update aware: the LAST
    trailer's reference and the LAST generation of the object win
    (appended updates supersede, PDF 7.5.6). Malformed structures
    degrade to None — never raise (F5)."""
    if not payload or not payload.startswith(b"%PDF-"):
        return None
    ref = None
    for d in _iter_trailer_dicts(payload):
        m = _INFO_REF_RE.search(d)
        if m:
            ref = (int(m.group(1)), int(m.group(2)))
    if ref is None:
        return None
    obj_re = re.compile(
        rb"(?:^|[^0-9])%d\s+%d\s+obj\s*<<(?P<d>.*?)>>\s*endobj"
        % ref, re.S)
    body = None
    for m in obj_re.finditer(expand_object_streams(payload)):
        body = m.group("d")
    if body is None:
        return None
    out: dict = {f: None for f in INFO_FIELDS}
    for key, field in _INFO_KEYS.items():
        vm = re.search(rb"/" + key + rb"\s*(?P<v>" + _BLIT + rb"|"
                       + _BHEX + rb")", body)
        if not vm:
            continue
        text = _pdf_text(vm.group("v")).strip()
        out[field] = text or None
    out["creation_date"] = pdf_date_to_iso(out["creation_date"])
    out["mod_date"] = pdf_date_to_iso(out["mod_date"])
    return out


# --- document outline (bookmarks) --------------------------------------------
# The PDF table of contents (12.3.3): /Root catalog -> /Outlines ->
# a doubly-linked tree of items (/First//Next children-siblings,
# /Title strings). The docling-analog heading surface for PDFs — the
# section titles a layout pass can't always recover from body text.

_ROOT_REF_RE = re.compile(rb"/Root\s+(\d+)\s+(\d+)\s+R")


def _ref_of(body: bytes, key: bytes) -> tuple[int, int] | None:
    m = re.search(rb"/" + key + rb"\s+(\d+)\s+(\d+)\s+R(?![\w])", body)
    return (int(m.group(1)), int(m.group(2))) if m else None


def _object_body(payload: bytes, ref: tuple[int, int]) -> bytes | None:
    """Dict body of object ``num gen`` — the LAST occurrence wins
    (appended incremental updates supersede, PDF 7.5.6). Production
    would binary-search the xref; the fixture-scale full scan keeps
    the reader dependency-free."""
    obj_re = re.compile(
        rb"(?:^|[^0-9])%d\s+%d\s+obj\s*<<(?P<d>.*?)>>\s*"
        rb"(?:stream|endobj)" % ref, re.S)
    body = None
    for m in obj_re.finditer(payload):
        body = m.group("d")
    return body


def extract_pdf_outline(payload: bytes) -> list[tuple[int, int, str]]:
    """(pos, depth, title) per outline item in preorder — depth 1 for
    top-level bookmarks. PDFs without an /Outlines tree (or with an
    empty one) yield []; cycles and runaway trees are cut at 10 000
    items; malformed structures degrade to fewer rows, never raise
    (F5)."""
    if not payload or not payload.startswith(b"%PDF-"):
        return []
    root_ref = None
    for d in _iter_trailer_dicts(payload):
        m = _ROOT_REF_RE.search(d)
        if m:
            root_ref = (int(m.group(1)), int(m.group(2)))
    if root_ref is None:
        return []
    payload = expand_object_streams(payload)
    catalog = _object_body(payload, root_ref)
    if catalog is None:
        return []
    outlines_ref = _ref_of(catalog, b"Outlines")
    if outlines_ref is None:
        return []
    outlines = _object_body(payload, outlines_ref)
    if outlines is None:
        return []
    out: list[tuple[int, int, str]] = []
    seen: set[tuple[int, int]] = set()
    stack: list[tuple[tuple[int, int], int]] = []
    first = _ref_of(outlines, b"First")
    if first:
        stack.append((first, 1))
    while stack and len(out) < 10_000:
        ref, depth = stack.pop()
        if ref in seen:
            continue                    # cycle guard
        seen.add(ref)
        body = _object_body(payload, ref)
        if body is None:
            continue
        tm = re.search(rb"/Title\s*(?P<v>" + _BLIT + rb"|" + _BHEX
                       + rb")", body)
        title = _pdf_text(tm.group("v")).strip() if tm else ""
        # push the sibling BEFORE the child: LIFO pops child first,
        # then the sibling — preorder
        nxt = _ref_of(body, b"Next")
        if nxt:
            stack.append((nxt, depth))
        child = _ref_of(body, b"First")
        if child:
            stack.append((child, depth + 1))
        if title:
            out.append((len(out), depth, title))
    return out
