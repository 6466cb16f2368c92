"""DOCX-subset reader (S6) — pure Python, stdlib only (zip + XML).

Reference analog: ``unstructured_chunker.py:79-91`` loads ``.docx``
via ``Docx2txtLoader`` (paragraph text extraction), joins the text and
token-chunks it. This module re-expresses the extraction subset:

- a ``.docx`` is a zip archive; the body lives at ``word/document.xml``
- each ``w:p`` paragraph yields one element, text = concat of its
  ``w:t`` runs, in document order
- a paragraph whose style is ``HeadingN`` / ``Title`` -> ``heading``;
  one carrying numbering (``w:numPr``) -> ``list_item``; else ``text``

Spark-free like the rest of ``extractor/`` (it is the oracle; the
Spark source calls the same function per row). ``make_docx``
synthesizes a minimal-but-real document for tests and fixtures.
"""

from __future__ import annotations

import io
import re
import zipfile
from dataclasses import dataclass
from xml.etree import ElementTree as ET

_W = ("http://schemas.openxmlformats.org/wordprocessingml/2006/main")
_NS = {"w": _W}

_DOC_PART = "word/document.xml"

KIND_HEADING = "heading"
KIND_LIST_ITEM = "list_item"
KIND_TEXT = "text"


@dataclass
class DocxElement:
    para: int      # 0-based paragraph index in document order
    kind: str      # heading | list_item | text
    text: str


def is_docx(payload: bytes | None) -> bool:
    """Zip magic + the wordprocessing body part present."""
    if not payload or not payload.startswith(b"PK\x03\x04"):
        return False
    try:
        with zipfile.ZipFile(io.BytesIO(payload)) as zf:
            return _DOC_PART in zf.namelist()
    except Exception:
        return False


def _para_kind(p: ET.Element) -> str:
    ppr = p.find("w:pPr", _NS)
    if ppr is not None:
        style = ppr.find("w:pStyle", _NS)
        val = style.get(f"{{{_W}}}val", "") if style is not None else ""
        if val.startswith("Heading") or val == "Title":
            return KIND_HEADING
        if ppr.find("w:numPr", _NS) is not None:
            return KIND_LIST_ITEM
    return KIND_TEXT


def extract_docx(payload: bytes) -> list[DocxElement]:
    """Parse a DOCX payload into ordered paragraph elements.

    Raises on a non-zip payload (caller handles fallback, F5
    semantics); a malformed document part yields no elements.
    """
    out: list[DocxElement] = []
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        try:
            root = ET.fromstring(zf.read(_DOC_PART))
        except (KeyError, ET.ParseError):
            return out
    body = root.find("w:body", _NS)
    if body is None:
        return out
    for idx, p in enumerate(body.findall("w:p", _NS)):
        text = "".join(t.text or "" for t in p.findall(".//w:t", _NS))
        if not text.strip():
            continue
        out.append(DocxElement(idx, _para_kind(p), text))
    return out


def extract_docx_text(payload: bytes) -> tuple[str, list[tuple[int, int,
                                                               str]]]:
    """A1-style reassembly: paragraphs joined with "\\n" in document
    order, with (start, end, kind) char spans per paragraph."""
    parts: list[str] = []
    spans: list[tuple[int, int, str]] = []
    pos = 0
    for el in extract_docx(payload):
        if parts:
            pos += 1
        spans.append((pos, pos + len(el.text), el.kind))
        parts.append(el.text)
        pos += len(el.text)
    return "\n".join(parts), spans


# ---------------------------------------------------------------------------
# document synthesis (fixture support — same zip layout real files use)

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.wordprocessingml.document.main'
    '+xml"/></Types>')

_DOC_TMPL = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<w:document xmlns:w="{_W}"><w:body>{{paras}}</w:body></w:document>')

_HEADING_PARA = ('<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr>'
                 "<w:r><w:t>{text}</w:t></w:r></w:p>")
_LIST_PARA = ('<w:p><w:pPr><w:numPr><w:ilvl w:val="0"/>'
              '<w:numId w:val="1"/></w:numPr></w:pPr>'
              "<w:r><w:t>{text}</w:t></w:r></w:p>")
_PLAIN_PARA = "<w:p><w:r><w:t>{text}</w:t></w:r></w:p>"


# XML 1.0 Char production complement: C0 controls except \t\n\r,
# surrogates, U+FFFE/U+FFFF. The encode half must produce decodable
# output — a raw noncharacter makes the part unparseable and the
# decoder (correctly) skips it.
_XML_BAD = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\ud800-\udfff￾￿]")


def _esc(s: str) -> str:
    s = _XML_BAD.sub("", s)
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def make_docx(paras: list[tuple[str, str]],
              extra_parts: dict[str, str] | None = None) -> bytes:
    """Build a document. ``paras``: [(kind, text)] with kind in
    {"heading", "list_item", "text"}. ``extra_parts`` appends
    additional zip members (e.g. docProps/core.xml from
    ``officemeta.build_core_properties``) AFTER the body part —
    existing goldens never depend on them."""
    tmpl = {KIND_HEADING: _HEADING_PARA, KIND_LIST_ITEM: _LIST_PARA,
            KIND_TEXT: _PLAIN_PARA}
    body = "".join(tmpl[k].format(text=_esc(t)) for k, t in paras)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr(_DOC_PART, _DOC_TMPL.format(paras=body))
        for name, content in (extra_parts or {}).items():
            zf.writestr(name, content)
    return buf.getvalue()
