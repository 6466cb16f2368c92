"""HTML structural element stream (headings / list items /
paragraphs) — Spark-free, pure Python.

The HTML member of the shared per-format ELEMENT SCHEMA
(url, para, kind, level, text) that the docx/odt/rtf loaders emit:
with this pass, `operators/chunking.py:section_chunks` sections a web
page exactly like an office document, and the heading ladder itself
is the page's table of contents (the reference's partitioners yield
Title/ListItem/NarrativeText elements the same way).

Built on the fast scanner like the other satellites and wired into
the one-parse ``pagex`` pass (``outline_from_root``). This module is
the correctness oracle: the Spark operator
(``operators/pagemeta.py:extract_outline_df``) calls the same
function per Arrow batch, so golden parity is structural.

Determinism contract (one text, one owner — nothing double-extracts):
- ``h1``-``h6`` -> ("heading", digit level, subtree text);
- ``li`` -> ("list_item", nesting depth of enclosing
  ul/ol/menu/dir, text STOPPING at nested list and heading
  boundaries — the tablex nested-table rule); an li outside any
  list container (tag soup) gets level 1;
- ``p`` -> ("text", 0, text stopping at block boundaries: a stray
  unclosed ``<p>`` swallowing a list must not re-own the items);
  a ``p`` inside an ``li`` is NOT emitted — its text already belongs
  to the innermost structural owner, the item;
- text is ``htmlx.subtree_text`` semantics (whitespace-normalized
  raw slices, entities preserved — the linkx anchor-text contract);
- script/style/template subtrees never contribute; ``<pre>`` blocks
  belong to the code family (codex), not the outline;
- whitespace-empty elements are dropped; ``para`` numbers emitted
  rows densely from 0 in document order; malformed pages degrade to
  fewer rows, never raise (F5).
"""
from __future__ import annotations

from .htmlx import _Node, decode_payload, parse_dom, subtree_text

_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
_LIST_CONTAINERS = ("ul", "ol", "menu", "dir")
_DROP = ("script", "style", "template", "pre")
_P_STOPS = ("ul", "ol", "menu", "dir", "table", "pre", "blockquote",
            "div", "section", "article", "p", "li",
            "h1", "h2", "h3", "h4", "h5", "h6")
_LI_STOPS = _LIST_CONTAINERS + ("h1", "h2", "h3", "h4", "h5", "h6")

KIND_HEADING = "heading"
KIND_LIST_ITEM = "list_item"
KIND_TEXT = "text"


def outline_from_root(root: _Node, src: str) -> list[tuple]:
    """(para, kind, level, text) per structural element."""
    out: list[tuple] = []

    def emit(kind: str, level: int, text: str) -> None:
        if text:
            out.append((len(out), kind, level, text))

    # explicit stack walk: (node, list_depth, in_li)
    stack = [(c, 0, False) for c in reversed(root.children)
             if isinstance(c, _Node)]
    while stack:
        el, depth, in_li = stack.pop()
        tag = el.tag
        if tag in _DROP:
            continue
        lvl = _HEADINGS.get(tag)
        if lvl is not None:
            emit(KIND_HEADING, lvl, subtree_text(el, src))
            continue                    # headings are leaves here
        if tag == "li":
            emit(KIND_LIST_ITEM, max(depth, 1),
                 subtree_text(el, src, stop_tags=_LI_STOPS))
            # descend only into nested lists (their items are theirs)
            for child in reversed(el.children):
                if isinstance(child, _Node):
                    stack.append((child, depth, True))
            continue
        if tag == "p":
            if not in_li:
                emit(KIND_TEXT, 0,
                     subtree_text(el, src, stop_tags=_P_STOPS))
            # fall through: block children swallowed by an unclosed
            # <p> still get walked (they were excluded from its text)
        child_depth = depth + 1 if tag in _LIST_CONTAINERS else depth
        for child in reversed(el.children):
            if isinstance(child, _Node):
                stack.append((child, child_depth, in_li))
    return out


def extract_outline(payload) -> list[tuple]:
    """(para, kind, level, text) for the document's structural
    elements (bytes decoded via the shared charset sniff)."""
    if isinstance(payload, (bytes, bytearray, memoryview)):
        src = decode_payload(bytes(payload))
    else:
        src = payload or ""
    return outline_from_root(parse_dom(src, full_attrs=True), src)
