"""TMX (Translation Memory eXchange) reader — pure Python, stdlib
XML, Spark-free.

The second bitext member of the loader family next to
``extractor/pox.py``: TMX is how CAT tools and the OPUS corpus
publish aligned segment pairs, so a training-data pipeline that
mines MT data reads it natively.

Deterministic subset (TMX 1.4):
- ``<header srclang=...>``: the declared source language
  (``*all*`` means any tuv may be the source — reported verbatim);
- one row per ``<tuv>`` inside each ``<tu>`` in document order:
  (tu index, tuid attr, tuv position within the tu, language,
  segment text); language = ``xml:lang`` with a bare ``lang``
  fallback, lowercased (BCP 47 is case-insensitive);
- segment text: character content of ``<seg>`` with inline markup
  resolved — ``bpt/ept/ph/it/ut`` subtrees are native formatting
  CODE and contribute nothing (their tails do); every other inline
  element (``hi``, ``sub``) keeps its text; whitespace verbatim;
- a ``tuv`` without a ``seg`` or without a language is skipped; a
  ``tu`` with fewer than 1 usable tuv emits nothing; namespaced
  documents match by local element name.

``build_tmx`` is the encode half for fixtures (must round-trip).
"""

from __future__ import annotations

from xml.etree import ElementTree as ET

_XML_LANG = "{http://www.w3.org/XML/1998/namespace}lang"
_CODE_TAGS = {"bpt", "ept", "ph", "it", "ut"}


def _local(tag) -> str:
    return tag.split("}")[-1] if isinstance(tag, str) else ""


def seg_text(seg: ET.Element) -> str:
    """Character content with bpt/ept/ph/it/ut code subtrees
    dropped (tails kept); hi/sub and unknown inline tags keep
    their text."""
    parts: list[str] = []

    def walk(el: ET.Element) -> None:
        if el.text:
            parts.append(el.text)
        for ch in el:
            if _local(ch.tag) not in _CODE_TAGS:
                walk(ch)
            if ch.tail:
                parts.append(ch.tail)

    walk(seg)
    return "".join(parts)


def _decode(payload) -> str:
    if payload is None:
        return ""
    if isinstance(payload, str):
        return payload
    try:
        return payload.decode("utf-8")
    except UnicodeDecodeError:
        return payload.decode("cp1252", errors="replace")


def extract_tmx(payload) -> dict:
    """TMX payload -> {"srclang": str|None, "rows": [(tu, tuid,
    pos, lang, seg)]} with 0-based tu/pos indexes in document
    order. Malformed XML or a non-tmx root yields no rows."""
    text = _decode(payload)
    # strip a UTF-8 BOM that survives decode
    if text.startswith("\ufeff"):
        text = text[1:]
    try:
        root = ET.fromstring(text)
    except (ET.ParseError, ValueError, LookupError):
        return {"srclang": None, "rows": []}
    if _local(root.tag) != "tmx":
        return {"srclang": None, "rows": []}
    srclang = None
    for el in root.iter():
        if _local(el.tag) == "header":
            srclang = el.get("srclang")
            break
    rows: list[tuple[int, str | None, int, str, str]] = []
    tu_idx = 0
    for tu in root.iter():
        if _local(tu.tag) != "tu":
            continue
        tuid = tu.get("tuid")
        pos = 0
        emitted = False
        for tuv in tu:
            if _local(tuv.tag) != "tuv":
                continue
            lang = tuv.get(_XML_LANG) or tuv.get("lang")
            seg = next((c for c in tuv
                        if _local(c.tag) == "seg"), None)
            if not lang or seg is None:
                continue
            rows.append((tu_idx, tuid, pos, lang.lower(),
                         seg_text(seg)))
            pos += 1
            emitted = True
        if emitted:
            tu_idx += 1
    return {"srclang": srclang, "rows": rows}


def build_tmx(tus: list[dict], srclang: str = "en") -> str:
    """Encode half (fixtures): ``tus`` = [{"tuid": str|None,
    "tuvs": [(lang, seg_markup)]}] where seg_markup is RAW inner
    XML (inline tags allowed)."""
    def esc(s: str) -> str:
        return (s.replace("&", "&amp;").replace("<", "&lt;")
                .replace(">", "&gt;").replace('"', "&quot;"))

    parts = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<tmx version="1.4">',
             f'<header srclang="{esc(srclang)}" datatype='
             '"plaintext" segtype="sentence" adminlang="en" '
             'o-tmf="x" creationtool="fixtures" '
             'creationtoolversion="1"/>',
             "<body>"]
    for tu in tus:
        tuid = tu.get("tuid")
        attr = f' tuid="{esc(tuid)}"' if tuid is not None else ""
        parts.append(f"<tu{attr}>")
        for lang, seg in tu["tuvs"]:
            parts.append(f'<tuv xml:lang="{esc(lang)}">'
                         f"<seg>{seg}</seg></tuv>")
        parts.append("</tu>")
    parts.append("</body></tmx>")
    return "".join(parts)
