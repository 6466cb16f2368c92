"""Payload-kind sniffing by magic bytes.

Generalizes the reference's file-extension dispatch (``main.py:91-97``:
keep ``.pdf/.docx/.pptx``, doc-type from parent dir) and its base64 /
image magic-byte sniffing (``utils/multimodal_RAG_methods.py:313-334``)
into content-based detection over a BINARY payload column:

- ``%PDF-`` prefix                      -> ``pdf``
- leading ``<`` / ``<!doctype`` / BOM+< -> ``html``
- anything else (empty, truncated,
  random bytes)                         -> ``empty`` (fallback to the
  row's ``text`` column; counted as fallback rows in lineage, never a
  job failure — reference F5 semantics,
  ``llm_support_kickoff_parser.py:28-30``).
"""

from __future__ import annotations

_BOMS = (b"\xef\xbb\xbf", b"\xff\xfe", b"\xfe\xff")

KIND_HTML = "html"
KIND_PDF = "pdf"
KIND_ZIP = "zip"  # OOXML container candidate (pptx subset, S7)
KIND_RTF = "rtf"
KIND_EMPTY = "empty"


def sniff_kind(payload: bytes | None) -> str:
    """Classify a raw payload as 'pdf' | 'html' | 'zip' | 'rtf' |
    'empty'."""
    if not payload:
        return KIND_EMPTY
    head = payload[:256]
    for bom in _BOMS:
        if head.startswith(bom):
            head = head[len(bom):]
            break
    stripped = head.lstrip(b" \t\r\n\x0c")
    if stripped.startswith(b"%PDF-"):
        return KIND_PDF
    low = stripped[:64].lower()
    if low.startswith((b"<!doctype", b"<html", b"<head", b"<body", b"<?xml")):
        return KIND_HTML
    if stripped.startswith(b"<"):
        return KIND_HTML
    if stripped.startswith(b"{\\rtf"):
        return KIND_RTF
    if payload.startswith(b"PK\x03\x04"):
        # zip container: the dispatcher confirms which OOXML type (a
        # pptx has ppt/slides/ parts); non-OOXML zips fall back
        return KIND_ZIP
    return KIND_EMPTY
