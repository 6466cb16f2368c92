"""pdfminer-style layout pass for a controlled PDF subset (pure Python).

The environment ships no pdfminer.six (SURVEY.md §7.0), so this targets
the subset our fixture generator synthesizes: content streams with
``BT/ET`` text objects, ``Tj``/``TJ`` show-text and ``Td/TD/T*``
positioning — stored either raw or ``/Filter /FlateDecode`` zlib-
compressed (the near-universal real-world encoding; zlib is stdlib).
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
nests another dict (``/DecodeParms << ... >>``) or a Flate body that
fails to inflate skips that stream — degrade, never raise (F5 gate).

Offsets: the payload is decoded latin-1 (1 byte == 1 char), so each
span's ``(start, end)`` indexes the interior of the string literal in
the decoded payload; when the literal contains no escapes the verbatim
invariant ``text == src[start:end]`` holds (our fixtures guarantee it;
escaped literals are still decoded correctly, their spans simply cover
the raw escaped form). For Flate streams no payload position exists:
spans index the INFLATED content stream instead (page-local), same
structural shape either way.
"""

from __future__ import annotations

import re
import zlib

_STREAM_HDR_RE = re.compile(rb"<<(?P<dict>[^<]*)>>\s*stream\r?\n")
_LEN_RE = re.compile(rb"/Length\s+(\d+)")
_TEXTOBJ_RE = re.compile(r"BT(.*?)ET", re.S)
# string literal (no nested parens in our subset, escaped chars allowed)
_LIT = r"\((?:[^()\\]|\\.)*\)"
_SHOW_RE = re.compile(
    rf"(?P<lit>{_LIT})\s*Tj"            # (text) Tj
    rf"|\[(?P<arr>(?:{_LIT}|[-\d.\s])*)\]\s*TJ",  # [(a) -120 (b)] TJ
    re.S,
)
_LIT_RE = re.compile(_LIT, re.S)

_ESCAPES = {
    "n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f",
    "(": "(", ")": ")", "\\": "\\",
}


def _unescape(raw: str) -> str:
    out: list[str] = []
    i, n = 0, len(raw)
    while i < n:
        ch = raw[i]
        if ch == "\\" and i + 1 < n:
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
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def iter_content_streams(payload: bytes):
    """Yield ``(body_start, body_bytes, flate)`` per content stream.

    ``/Length`` slices the body exactly when present; otherwise the
    body runs to the next ``endstream`` (trailing EOL stripped). Flate
    bodies arrive INFLATED with ``flate=True``; a body that fails to
    inflate is skipped (degrade, never raise). The header scan resumes
    past each body, so compressed bytes can never be misread as a
    stream header.
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
        flate = b"/FlateDecode" in sdict
        if flate:
            try:
                body = zlib.decompress(body)
            except Exception:
                continue  # corrupt stream: skip it, never raise
        yield body_start, body, flate


def extract_pdf(payload: bytes) -> tuple[str, list[tuple[int, int, str]], float]:
    """(extracted_text, spans, score) for a PDF-subset payload.

    spans index into the latin-1 decoded payload for raw streams, or
    the inflated content stream (page-local) for Flate streams;
    kind = ``page<N>``.
    """
    segments: list[tuple[int, int, str]] = []
    texts: list[str] = []
    page = 0
    for body_start, body, flate in iter_content_streams(payload):
        body_str = body.decode("latin-1")
        if "BT" not in body_str:
            continue
        page += 1
        # char offset == byte offset under latin-1; Flate spans are
        # page-local (index the inflated stream, base 0)
        base = 0 if flate else body_start
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
                    start = base + obj_off + rel + 1
                    segments.append((start, start + len(interior), kind))
                    texts.append(_unescape(interior))
    text = "\n".join(texts)
    score = float(page)
    return text, segments, score
