"""PPTX-subset reader (S7) — pure Python, stdlib only (zip + XML).

Reference analog: ``utils/loaders.py:30-37`` dispatches ``.pptx`` files
to ``unstructured.partition.pptx.partition_pptx``, which walks the
slide XML and emits Title / ListItem / NarrativeText elements per
slide. This module re-expresses that subset without the dependency:

- a ``.pptx`` is a zip archive; slides live at ``ppt/slides/slideN.xml``
- a shape (``p:sp``) whose placeholder (``p:ph``) type is ``title`` /
  ``ctrTitle`` yields ``title`` elements
- a paragraph (``a:p``) with a bullet marker (``a:buChar`` /
  ``a:buAutoNum`` in its ``a:pPr``) yields a ``list_item``
- any other non-empty paragraph yields ``text`` (NarrativeText)
- elements are ordered (slide, shape document order, paragraph order)

Like the rest of ``extractor/``, this file is Spark-free: it is the
correctness oracle, and the Spark source (``sources.read_pptx_elements``)
calls the same function per row, making equality structural.

``make_pptx`` synthesizes a minimal-but-real deck (same zip layout) so
tests and fixtures never need binary test assets.
"""

from __future__ import annotations

import io
import re
import zipfile
from dataclasses import dataclass
from xml.etree import ElementTree as ET

_A = "http://schemas.openxmlformats.org/drawingml/2006/main"
_P = "http://schemas.openxmlformats.org/presentationml/2006/main"
_NS = {"a": _A, "p": _P}

_SLIDE_RE = re.compile(r"^ppt/slides/slide(\d+)\.xml$")

KIND_TITLE = "title"
KIND_LIST_ITEM = "list_item"
KIND_TEXT = "text"


@dataclass
class PptxElement:
    slide: int     # 1-based slide number (from the slide file name)
    shape: int     # 0-based shape index within the slide
    para: int      # 0-based paragraph index within the shape
    kind: str      # title | list_item | text
    text: str


def is_pptx(payload: bytes | None) -> bool:
    """Cheap containment check: zip magic + a slide part present."""
    if not payload or not payload.startswith(b"PK\x03\x04"):
        return False
    try:
        with zipfile.ZipFile(io.BytesIO(payload)) as zf:
            return any(_SLIDE_RE.match(n) for n in zf.namelist())
    except Exception:
        return False


def _para_text(p: ET.Element) -> str:
    return "".join(t.text or "" for t in p.findall(".//a:t", _NS))


def _para_is_bulleted(p: ET.Element) -> bool:
    ppr = p.find("a:pPr", _NS)
    if ppr is None:
        return False
    return (ppr.find("a:buChar", _NS) is not None
            or ppr.find("a:buAutoNum", _NS) is not None)


def _shape_is_title(sp: ET.Element) -> bool:
    ph = sp.find(".//p:nvSpPr//p:ph", _NS)
    if ph is None:
        ph = sp.find(".//p:ph", _NS)
    return ph is not None and ph.get("type") in ("title", "ctrTitle")


def extract_pptx(payload: bytes) -> list[PptxElement]:
    """Parse a PPTX payload into ordered elements.

    Raises on a non-zip payload (caller handles fallback, F5
    semantics); individual malformed slide parts are skipped.
    """
    out: list[PptxElement] = []
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        slides = sorted(
            ((int(m.group(1)), n) for n in zf.namelist()
             if (m := _SLIDE_RE.match(n))),
            key=lambda t: t[0])
        for slide_no, name in slides:
            try:
                root = ET.fromstring(zf.read(name))
            except (ET.ParseError, ValueError, LookupError):
                continue
            tree = root.find(".//p:cSld/p:spTree", _NS)
            if tree is None:
                continue
            for shape_idx, sp in enumerate(tree.findall("p:sp", _NS)):
                title_shape = _shape_is_title(sp)
                body = sp.find(".//p:txBody", _NS)
                if body is None:
                    continue
                for para_idx, p in enumerate(body.findall("a:p", _NS)):
                    text = _para_text(p)
                    if not text.strip():
                        continue
                    if title_shape:
                        kind = KIND_TITLE
                    elif _para_is_bulleted(p):
                        kind = KIND_LIST_ITEM
                    else:
                        kind = KIND_TEXT
                    out.append(PptxElement(slide_no, shape_idx, para_idx,
                                           kind, text))
    return out


def extract_pptx_text(payload: bytes) -> tuple[str, list[tuple[int, int,
                                                               str]]]:
    """A1-style reassembly: elements joined with "\\n" in reading
    order, with (start, end, kind) char spans per element."""
    parts: list[str] = []
    spans: list[tuple[int, int, str]] = []
    pos = 0
    for el in extract_pptx(payload):
        if parts:
            pos += 1  # the "\n" separator
        spans.append((pos, pos + len(el.text), el.kind))
        parts.append(el.text)
        pos += len(el.text)
    return "\n".join(parts), spans


# ---------------------------------------------------------------------------
# deck synthesis (fixture support — same zip layout real decks use)

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/ppt/presentation.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.presentationml.presentation.main'
    '+xml"/>'
    "{slide_overrides}</Types>")

_SLIDE_OVERRIDE = (
    '<Override PartName="/ppt/slides/slide{n}.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.presentationml.'
    'slide+xml"/>')

_PRESENTATION = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<p:presentation xmlns:p="{_P}"/>')

_SLIDE_TMPL = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<p:sld xmlns:a="{_A}" xmlns:p="{_P}">'
    "<p:cSld><p:spTree>{shapes}</p:spTree></p:cSld></p:sld>")

_TITLE_SHAPE = (
    '<p:sp><p:nvSpPr><p:nvPr><p:ph type="title"/></p:nvPr></p:nvSpPr>'
    "<p:txBody><a:p><a:r><a:t>{text}</a:t></a:r></a:p></p:txBody></p:sp>")

_BODY_SHAPE = (
    '<p:sp><p:nvSpPr><p:nvPr><p:ph type="body" idx="1"/></p:nvPr>'
    "</p:nvSpPr><p:txBody>{paras}</p:txBody></p:sp>")

_BULLET_PARA = ('<a:p><a:pPr><a:buChar char="•"/></a:pPr>'
                "<a:r><a:t>{text}</a:t></a:r></a:p>")
_PLAIN_PARA = ("<a:p><a:pPr><a:buNone/></a:pPr>"
               "<a:r><a:t>{text}</a:t></a:r></a:p>")


# XML 1.0 Char production complement (see docx._XML_BAD): the encode
# half must produce decodable output — a raw U+FFFE makes the slide
# part unparseable and extract_pptx (correctly) skips it.
_XML_BAD = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\ud800-\udfff￾￿]")


def _esc(s: str) -> str:
    s = _XML_BAD.sub("", s)
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def make_pptx(slides: list[dict],
              extra_parts: dict[str, str] | None = None) -> bytes:
    """Build a deck. Each slide dict: ``{"title": str | None,
    "paras": [(text, bulleted: bool), ...]}``. ``extra_parts``
    appends additional zip members (e.g. docProps/core.xml)."""
    overrides = "".join(_SLIDE_OVERRIDE.format(n=i + 1)
                        for i in range(len(slides)))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml",
                    _CONTENT_TYPES.format(slide_overrides=overrides))
        zf.writestr("ppt/presentation.xml", _PRESENTATION)
        for i, slide in enumerate(slides):
            shapes = []
            if slide.get("title"):
                shapes.append(_TITLE_SHAPE.format(text=_esc(slide["title"])))
            paras = "".join(
                (_BULLET_PARA if bulleted else _PLAIN_PARA).format(
                    text=_esc(text))
                for text, bulleted in slide.get("paras", []))
            if paras:
                shapes.append(_BODY_SHAPE.format(paras=paras))
            zf.writestr(f"ppt/slides/slide{i + 1}.xml",
                        _SLIDE_TMPL.format(shapes="".join(shapes)))
        for name, content in (extra_parts or {}).items():
            zf.writestr(name, content)
    return buf.getvalue()
