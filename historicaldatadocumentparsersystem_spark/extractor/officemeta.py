"""Office-document metadata — the zip-container sibling of the PDF
/Info dictionary (extractor/pdfx.extract_pdf_info), completing the
provenance surface across every format the engine ingests:

- OOXML (docx/pptx): ``docProps/core.xml`` core properties
  (dc:title/creator/subject/description, cp:keywords,
  dcterms:created/modified — ECMA-376 part 2 §11)
- ODF (odt): ``meta.xml`` (dc:title/subject/description,
  meta:initial-creator with dc:creator fallback, meta:creation-date,
  dc:date as the modification stamp, repeated meta:keyword joined)
- EPUB: the OPF ``dc:`` block, via the SAME parser the chapter
  source uses (extractor/epubx._parse_opf — one OPF reader, not two)

Spark-free like the rest of ``extractor/`` (the oracle;
``sources.read_office_meta`` calls it per row). Reference analog:
unstructured/docling surface the same dictionaries alongside the
body (``unstructured_chunker.py:79-91``, ``docling_chunker.py:38-58``).
"""

from __future__ import annotations

import io
import zipfile
from xml.etree import ElementTree as ET

from .docx import is_docx
from .epubx import _opf_path, _parse_opf, is_epub
from .odtx import is_odt
from .pptx import is_pptx

META_FIELDS = ("title", "creator", "subject", "description",
               "keywords", "created", "modified")

_DC = "http://purl.org/dc/elements/1.1/"
_DCTERMS = "http://purl.org/dc/terms/"
_CP = ("http://schemas.openxmlformats.org/package/2006/metadata/"
       "core-properties")
_ODF_META = "urn:oasis:names:tc:opendocument:xmlns:meta:1.0"
_ODF_OFFICE = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"

_CORE_PART = "docProps/core.xml"
_ODF_META_PART = "meta.xml"


def _text(el: ET.Element | None) -> str | None:
    if el is None:
        return None
    t = " ".join((el.text or "").split())
    return t or None


def _core_properties(zf: zipfile.ZipFile) -> dict | None:
    try:
        root = ET.fromstring(zf.read(_CORE_PART))
    except (KeyError, ET.ParseError):
        return None
    out = {f: None for f in META_FIELDS}
    out["title"] = _text(root.find(f"{{{_DC}}}title"))
    out["creator"] = _text(root.find(f"{{{_DC}}}creator"))
    out["subject"] = _text(root.find(f"{{{_DC}}}subject"))
    out["description"] = _text(root.find(f"{{{_DC}}}description"))
    out["keywords"] = _text(root.find(f"{{{_CP}}}keywords"))
    out["created"] = _text(root.find(f"{{{_DCTERMS}}}created"))
    out["modified"] = _text(root.find(f"{{{_DCTERMS}}}modified"))
    return out


def _odf_meta(zf: zipfile.ZipFile) -> dict | None:
    try:
        root = ET.fromstring(zf.read(_ODF_META_PART))
    except (KeyError, ET.ParseError):
        return None
    meta = root.find(f"{{{_ODF_OFFICE}}}meta")
    if meta is None:
        return None
    out = {f: None for f in META_FIELDS}
    out["title"] = _text(meta.find(f"{{{_DC}}}title"))
    out["creator"] = (_text(meta.find(f"{{{_ODF_META}}}initial-creator"))
                      or _text(meta.find(f"{{{_DC}}}creator")))
    out["subject"] = _text(meta.find(f"{{{_DC}}}subject"))
    out["description"] = _text(meta.find(f"{{{_DC}}}description"))
    kws = [_text(k) for k in meta.findall(f"{{{_ODF_META}}}keyword")]
    kws = [k for k in kws if k]
    out["keywords"] = ", ".join(kws) if kws else None
    out["created"] = _text(meta.find(f"{{{_ODF_META}}}creation-date"))
    out["modified"] = _text(meta.find(f"{{{_DC}}}date"))
    return out


def extract_office_meta(payload: bytes) -> dict | None:
    """``{format, **META_FIELDS}`` for a zip-container office
    document, or None when the payload is not one / carries no
    metadata part. Format detection reuses each source's own sniffer
    (mimetype/part gated — the core.py dispatch order), so a document
    never double-claims."""
    if not payload or not payload.startswith(b"PK\x03\x04"):
        return None
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
    except Exception:
        return None
    with zf:
        if is_pptx(payload) or is_docx(payload):
            got = _core_properties(zf)
            if got is None:
                return None
            got["format"] = "pptx" if is_pptx(payload) else "docx"
            return got
        if is_odt(payload):
            got = _odf_meta(zf)
            if got is None:
                return None
            got["format"] = "odt"
            return got
        if is_epub(payload):
            opf = _opf_path(zf)
            if not opf:
                return None
            _paths, dc = _parse_opf(zf, opf)
            out = {f: None for f in META_FIELDS}
            out["title"] = dc.get("title")
            out["creator"] = dc.get("creator")
            out["format"] = "epub"
            return out
    return None


# --- encode half (fixtures) --------------------------------------------------

def _esc(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def build_core_properties(props: dict) -> str:
    """docProps/core.xml content for the OOXML fixture builders
    (pass via their ``extra_parts``); must itself decode — the
    fixture-writer rule."""
    tags = {"title": f"{{{_DC}}}title", "creator": f"{{{_DC}}}creator",
            "subject": f"{{{_DC}}}subject",
            "description": f"{{{_DC}}}description",
            "keywords": f"{{{_CP}}}keywords",
            "created": f"{{{_DCTERMS}}}created",
            "modified": f"{{{_DCTERMS}}}modified"}
    body = []
    for field, value in props.items():
        if value is None:
            continue
        tag = tags[field]
        ns, local = tag[1:].split("}")
        pfx = {"http://purl.org/dc/elements/1.1/": "dc",
               _DCTERMS: "dcterms", _CP: "cp"}[ns]
        attr = (' xsi:type="dcterms:W3CDTF"'
                if pfx == "dcterms" else "")
        body.append(f"<{pfx}:{local}{attr}>{_esc(value)}"
                    f"</{pfx}:{local}>")
    return ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<cp:coreProperties xmlns:cp="{_CP}" xmlns:dc="{_DC}" '
            f'xmlns:dcterms="{_DCTERMS}" '
            'xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance">'
            + "".join(body) + "</cp:coreProperties>")


def build_odf_meta(props: dict) -> str:
    """meta.xml content for the ODT fixture builder. ``keywords`` may
    be a list (one meta:keyword element each) or a string."""
    body = []
    if props.get("title"):
        body.append(f"<dc:title>{_esc(props['title'])}</dc:title>")
    if props.get("creator"):
        body.append(f"<meta:initial-creator>{_esc(props['creator'])}"
                    "</meta:initial-creator>")
    if props.get("subject"):
        body.append(f"<dc:subject>{_esc(props['subject'])}"
                    "</dc:subject>")
    if props.get("description"):
        body.append(f"<dc:description>{_esc(props['description'])}"
                    "</dc:description>")
    kws = props.get("keywords")
    if isinstance(kws, str):
        kws = [kws]
    for k in kws or ():
        body.append(f"<meta:keyword>{_esc(k)}</meta:keyword>")
    if props.get("created"):
        body.append(f"<meta:creation-date>{_esc(props['created'])}"
                    "</meta:creation-date>")
    if props.get("modified"):
        body.append(f"<dc:date>{_esc(props['modified'])}</dc:date>")
    return ('<?xml version="1.0" encoding="UTF-8"?>'
            f'<office:document-meta xmlns:office="{_ODF_OFFICE}" '
            f'xmlns:meta="{_ODF_META}" xmlns:dc="{_DC}" '
            'office:version="1.2"><office:meta>'
            + "".join(body) + "</office:meta></office:document-meta>")
