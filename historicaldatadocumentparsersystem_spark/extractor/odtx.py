"""ODT (OpenDocument Text) subset reader — pure Python, stdlib only.

The OASIS-standard sibling of the DOCX subset (reference loads office
documents via unstructured/Docx2txt, ``unstructured_chunker.py:79-91``;
LibreOffice-produced corpora are ODF, not OOXML — a crawl-scale
pipeline meets both). Container shape (ODF 1.2 §2-3):

- a ``.odt`` is a zip whose FIRST entry is ``mimetype`` =
  ``application/vnd.oasis.opendocument.text`` (stored, uncompressed —
  readable by magic sniffers); the body lives at ``content.xml`` under
  ``office:document-content / office:body / office:text``
- ``text:h`` -> heading (``text:outline-level``, default 1);
  ``text:p`` -> plain paragraph; ``text:list``/``text:list-item``
  nest arbitrarily and each item's paragraphs -> ``list_item``
- run text concatenates nested ``text:span`` content plus ODF's
  whitespace elements: ``text:s`` (``text:c`` repeated spaces,
  default 1), ``text:tab`` and ``text:line-break`` (ODF collapses
  literal whitespace; these elements are the canonical encoding)

Spark-free like the rest of ``extractor/`` (it IS the oracle; the
Spark source calls the same function per row). ``make_odt``
synthesizes minimal-but-real documents for fixtures — the encode half,
which must itself decode (the exifx fixture-writer rule).
"""

from __future__ import annotations

import io
import zipfile
from dataclasses import dataclass
from xml.etree import ElementTree as ET

_OFFICE = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
_TEXT = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
_NS = {"office": _OFFICE, "text": _TEXT}

MIMETYPE = "application/vnd.oasis.opendocument.text"
_CONTENT_PART = "content.xml"

KIND_HEADING = "heading"
KIND_LIST_ITEM = "list_item"
KIND_TEXT = "text"


@dataclass
class OdtElement:
    para: int      # 0-based paragraph index in document order
    kind: str      # heading | list_item | text
    level: int     # heading outline level / list nesting depth; 0 = text
    text: str


def is_odt(payload: bytes | None) -> bool:
    """Zip magic + ODF text mimetype (or, failing a readable mimetype
    entry, a content.xml with the office namespace — LibreOffice
    always writes the mimetype first, but ODF readers accept both)."""
    if not payload or not payload.startswith(b"PK\x03\x04"):
        return False
    try:
        with zipfile.ZipFile(io.BytesIO(payload)) as zf:
            names = zf.namelist()
            if "mimetype" in names:
                return zf.read("mimetype").strip() == MIMETYPE.encode()
            return _CONTENT_PART in names and \
                _OFFICE.encode() in zf.read(_CONTENT_PART)[:2048]
    except Exception:
        return False


def _run_text(el: ET.Element) -> str:
    """Text of a paragraph-level element: nested spans plus the ODF
    whitespace elements, in document order (ElementTree text/tail)."""
    parts: list[str] = [el.text or ""]
    for child in el:
        tag = child.tag
        if tag == f"{{{_TEXT}}}s":
            n = child.get(f"{{{_TEXT}}}c", "1")
            try:
                # clamp hostile counts: an attribute-fed allocation
                # must never OOM an executor (the
                # parse_image_dimensions precedent)
                parts.append(" " * min(max(int(n), 0), 10_000))
            except ValueError:
                parts.append(" ")
        elif tag == f"{{{_TEXT}}}tab":
            parts.append("\t")
        elif tag == f"{{{_TEXT}}}line-break":
            parts.append("\n")
        else:
            # text:span / text:a / any inline container: recurse
            parts.append(_run_text(child))
        parts.append(child.tail or "")
    return "".join(parts)


def _walk(parent: ET.Element, depth: int, out: list[OdtElement]) -> None:
    for el in parent:
        tag = el.tag
        if tag == f"{{{_TEXT}}}h":
            lvl = el.get(f"{{{_TEXT}}}outline-level", "1")
            try:
                level = max(int(lvl), 1)
            except ValueError:
                level = 1
            text = _run_text(el)
            if text.strip():
                out.append(OdtElement(len(out), KIND_HEADING, level, text))
        elif tag == f"{{{_TEXT}}}p":
            text = _run_text(el)
            if text.strip():
                kind = KIND_LIST_ITEM if depth > 0 else KIND_TEXT
                out.append(OdtElement(len(out), kind, depth, text))
        elif tag == f"{{{_TEXT}}}list":
            for item in el.findall("text:list-item", _NS):
                _walk(item, depth + 1, out)


def extract_odt(payload: bytes) -> list[OdtElement]:
    """Parse an ODT payload into ordered paragraph elements.

    Raises on a non-zip payload (caller handles fallback, F5
    semantics); a malformed content part yields no elements.
    """
    out: list[OdtElement] = []
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        try:
            root = ET.fromstring(zf.read(_CONTENT_PART))
        except (KeyError, ET.ParseError):
            return out
    body = root.find("office:body", _NS)
    if body is None:
        return out
    office_text = body.find("office:text", _NS)
    if office_text is None:
        return out
    _walk(office_text, 0, out)
    return out


def extract_odt_text(payload: bytes) -> tuple[str, list[tuple[int, int,
                                                              str]]]:
    """A1-style reassembly: paragraphs joined with "\\n" in document
    order, spans = (start, end, kind) per element over the joined
    text — the same contract as ``extract_docx_text``."""
    els = extract_odt(payload)
    parts: list[str] = []
    spans: list[tuple[int, int, str]] = []
    pos = 0
    for el in els:
        if parts:
            pos += 1  # the joining "\n"
        parts.append(el.text)
        spans.append((pos, pos + len(el.text), el.kind))
        pos += len(el.text)
    return "\n".join(parts), spans


# --- encode half (fixtures) --------------------------------------------------

_CONTENT_TMPL = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    f'<office:document-content xmlns:office="{_OFFICE}" '
    f'xmlns:text="{_TEXT}" office:version="1.2">'
    "<office:body><office:text>{body}</office:text></office:body>"
    "</office:document-content>")


def _esc(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def _encode_text(t: str) -> str:
    """Escape + re-express tabs/newlines/space-runs as the ODF
    whitespace elements (the canonical form a writer emits)."""
    out: list[str] = []
    i = 0
    while i < len(t):
        c = t[i]
        if c == "\t":
            out.append("<text:tab/>")
            i += 1
        elif c == "\n":
            out.append("<text:line-break/>")
            i += 1
        elif c == " " and i + 1 < len(t) and t[i + 1] == " ":
            j = i
            while j < len(t) and t[j] == " ":
                j += 1
            out.append(f'<text:s text:c="{j - i}"/>')
            i = j
        else:
            out.append(_esc(c))
            i += 1
    return "".join(out)


def make_odt(paras: list[tuple[str, str]],
             extra_parts: dict[str, str] | None = None) -> bytes:
    """Build a document. ``paras``: [(kind, text)] with kind in
    {"heading", "list_item", "text"}; a "span:" text prefix wraps the
    remainder in a nested text:span (inline-container coverage).
    ``extra_parts`` appends additional zip members (e.g. meta.xml
    from ``officemeta.build_odf_meta``)."""
    body: list[str] = []
    open_list = False
    for kind, text in paras:
        if text.startswith("span:"):
            enc = ("lead <text:span>"
                   + _encode_text(text[len("span:"):]) + "</text:span>")
        else:
            enc = _encode_text(text)
        if kind == KIND_LIST_ITEM:
            if not open_list:
                body.append("<text:list>")
                open_list = True
            body.append(f"<text:list-item><text:p>{enc}</text:p>"
                        "</text:list-item>")
            continue
        if open_list:
            body.append("</text:list>")
            open_list = False
        if kind == KIND_HEADING:
            body.append(f'<text:h text:outline-level="1">{enc}</text:h>')
        else:
            body.append(f"<text:p>{enc}</text:p>")
    if open_list:
        body.append("</text:list>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        # mimetype MUST be first and stored uncompressed (ODF §3.3)
        zf.writestr(zipfile.ZipInfo("mimetype"), MIMETYPE)
        zf.writestr(_CONTENT_PART,
                    _CONTENT_TMPL.format(body="".join(body)),
                    zipfile.ZIP_DEFLATED)
        for name, content in (extra_parts or {}).items():
            zf.writestr(name, content, zipfile.ZIP_DEFLATED)
    return buf.getvalue()
