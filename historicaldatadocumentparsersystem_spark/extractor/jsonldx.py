"""JSON-LD structured-data extraction (Spark-free, pure Python).

schema.org JSON-LD (`<script type="application/ld+json">`) is how
publishers hand crawlers machine-readable facts — Product/Article/
Recipe/FAQ records that large-scale pipelines mine as aligned
(text, structure) training pairs. The reference's loaders surface
per-document metadata; this is the corpus-level pass over the same
DOM for the embedded structured blocks.

Built on the fast scanner's full-attribute mode like linkx/metax (script is a
RAWTEXT element there, so the block body is one text child with exact
source offsets). This module is the correctness oracle: the Spark
operator (``operators/pagemeta.py:extract_jsonld_df``) calls these
functions from a mapInPandas batch — golden-parquet parity is
structural.

Determinism contract:
- blocks number in document order (``block_idx``), one output row per
  matching <script>, empty/whitespace-only bodies skipped;
- the ``type`` attribute matches case-insensitively and tolerates
  parameters/whitespace (``application/ld+json; charset=utf-8``);
- ``json_text`` is the raw source slice, stripped (entities preserved
  — script bodies are raw text, browsers do not entity-decode them);
- ``valid`` is stdlib ``json.loads`` acceptance; ``root_type`` is the
  top-level ``@type`` when the root is an object (a list value's
  first string element; None for arrays/scalars/missing/invalid) and
  ``schema_context`` any string ``@context``;
- malformed pages degrade to fewer rows, never raise (F5).
"""
from __future__ import annotations

import json

from .htmlx import (_Node, _Text, decode_payload, iter_elements,
                    parse_dom)


def _is_ldjson(node: _Node) -> bool:
    mime = (node.attrs.get("type") or "").split(";")[0].strip().lower()
    return mime == "application/ld+json"


def _raw_text(node: _Node, src: str) -> str:
    parts = []
    for child in node.children:
        if isinstance(child, _Text):
            parts.append(src[child.start:child.end])
    return "".join(parts)


def extract_jsonld(payload) -> list[tuple[int, str, bool,
                                          str | None, str | None]]:
    """(block_idx, json_text, valid, root_type, schema_context) per
    JSON-LD <script> block in document order."""
    if isinstance(payload, (bytes, bytearray, memoryview)):
        src = decode_payload(bytes(payload))
    else:
        src = payload or ""
    return jsonld_from_root(parse_dom(src, full_attrs=True), src)


def jsonld_from_root(root, src: str) -> list[tuple]:
    """extract_jsonld over an already-parsed tree."""
    out = []
    for el, _depth in iter_elements(root):
        if el.tag == "script" and _is_ldjson(el):
            body = _raw_text(el, src).strip()
            if body:
                valid, rtype, ctx = False, None, None
                try:
                    doc = json.loads(body)
                    valid = True
                except (ValueError, RecursionError):
                    doc = None
                if isinstance(doc, dict):
                    t = doc.get("@type")
                    if isinstance(t, str):
                        rtype = t
                    elif (isinstance(t, list) and t
                          and isinstance(t[0], str)):
                        rtype = t[0]
                    c = doc.get("@context")
                    if isinstance(c, str):
                        ctx = c
                out.append((len(out), body, valid, rtype, ctx))
    return out
