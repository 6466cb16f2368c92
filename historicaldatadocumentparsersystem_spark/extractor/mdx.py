"""HTML -> Markdown serialization (Spark-free, pure Python).

Markdown is the emission format modern LLM training pipelines want:
it preserves document STRUCTURE (headings, lists, tables, code, links)
that plain-text extraction flattens away, at a fraction of HTML's
token cost. The reference's loaders hand LangChain Documents to a
text splitter (doc_processor.py) — flat text; this pass is the
structured upgrade, and composes with the Arc90 main-content
extractor (serialize the winner subtree) or runs standalone over the
whole page.

Built on the fast scanner's full-attribute mode like the other
satellite extractors. This module is the correctness oracle: the
Spark operator (``operators/pagemeta.py:extract_markdown_df``) calls
the same function from a mapInPandas batch, so golden-parquet parity
is structural.

Determinism contract (GitHub-flavored subset):
- h1..h6 -> ``#``-prefix headings (hard breaks inside collapse to a
  space: headings are single-line);
- p and implicit text runs -> paragraphs separated by blank lines;
  <br> inside a paragraph is a plain newline;
- ul/ol -> ``- `` / ``1. `` items (ordered lists always renumber from
  1 in document order); nested blocks inside an <li> indent by the
  marker width; non-<li> children of a list render as marker-less
  indented blocks (browser behavior: they belong to the list);
- blockquote -> every line ``> ``-prefixed (bare ``>`` for blanks);
- pre -> fenced code block with RAW text (whitespace preserved,
  entities unescaped); the fence grows/switches if the content
  contains one; a ``language-x`` class on <pre> or an inner <code>
  becomes the info string;
- table -> GFM pipe table via the tablex row walk (first row is the
  header row whether or not it is <th>; short rows pad to the widest;
  ``|`` in cells escapes; nested tables flatten into the parent cell);
- a -> ``[label](href)`` with the href EXACTLY as written (no base
  resolution — that is linkx's job; spaces/parens percent-escape so
  the link survives a markdown parser); img -> ``![alt](src)``;
- strong/b -> ``**``, em/i -> ``*``, del/s/strike -> ``~~``,
  code/kbd/samp -> backtick spans (backticks inside widen the span);
- text escapes the structural characters ``\\ ` * _ [ ]`` (never
  inside code); entities are unescaped (markdown is plain text — the
  opposite of the linkx raw-slice contract);
- script/style/noscript/template/head/iframe/svg/canvas and form
  controls are dropped; unknown inline tags are transparent;
- subtrees deeper than ``_MAX_DEPTH`` flatten to normalized text
  (bounded recursion: adversarial nesting degrades, never raises).
"""
from __future__ import annotations

import re
from html import unescape

from .htmlx import (_Node, _Text, decode_payload, iter_elements,
                    parse_dom, subtree_text)

# subtrees that never contribute output (invisible or control chrome)
_DROP = frozenset(
    "script style noscript template head title meta link base iframe "
    "svg canvas object applet embed select option datalist input button "
    "textarea label".split())

# tags serialized as blocks; anything else is inline/transparent
_BLOCK = frozenset(
    "address article aside blockquote body caption center dd details "
    "dir div dl dt fieldset figcaption figure footer form h1 h2 h3 h4 "
    "h5 h6 header hr html li main menu nav ol p pre section summary "
    "table tbody td tfoot th thead tr ul".split())

_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
_CODE_TAGS = ("code", "kbd", "samp")

_MAX_DEPTH = 120          # recursion guard: beyond this, flatten to text
_BR = "\x00"              # hard-break sentinel, survives ws collapse
_ESC_RE = re.compile(r"[\\`*_\[\]]")
_WS_RE = re.compile(r"[ \t\r\n\f\v]+")
_LANG_RE = re.compile(r"(?:^|\s)language-([\w+.#-]+)", re.I)


def _esc(text: str) -> str:
    return _ESC_RE.sub(lambda m: "\\" + m.group(0), text)


def _txt(raw: str) -> str:
    """Source slice -> plain text: entities unescaped, NUL replaced by
    U+FFFD (the HTML5 rule — and NUL is the hard-break sentinel)."""
    return unescape(raw).replace("\x00", "�")


def _collapse(s: str) -> str:
    """Whitespace-collapse an inline run, resolving hard-break
    sentinels to newlines (spaces around a break are absorbed)."""
    s = _WS_RE.sub(" ", s)
    s = re.sub(r" ?\x00+ ?", "\n", s).strip(" ")
    return s.strip("\n")


def _oneline(s: str) -> str:
    """Collapse with hard breaks demoted to spaces (headings, labels,
    table cells are single-line contexts)."""
    return _WS_RE.sub(" ", s.replace(_BR, " ")).strip()


def _url(u: str) -> str:
    """Percent-escape the characters that break a markdown ``(url)``."""
    return (u.replace(" ", "%20").replace("(", "%28").replace(")", "%29")
             .replace("\n", "%0A").replace("\t", "%09").replace("\r", ""))


def _flat(el: _Node, src: str) -> str:
    """Depth-cap degrade: the subtree as escaped normalized text."""
    return _esc(_txt(subtree_text(el, src, stop_tags=tuple(_DROP))))


# --- inline rendering --------------------------------------------------------

def _inline(node: _Node, src: str, depth: int, in_code: bool,
            no_tables: bool = False) -> str:
    parts: list[str] = []
    for child in node.children:
        if isinstance(child, _Text):
            t = _txt(src[child.start:child.end])
            parts.append(t if in_code else _esc(t))
        else:
            parts.append(_inline_el(child, src, depth, in_code,
                                    no_tables))
    return "".join(parts)


def _wrap(inner: str, marker: str) -> str:
    """Put ``marker`` inside the whitespace fringe so emphasis abuts
    its text (``foo **bar** baz``, never ``foo ** bar** baz``)."""
    core = inner.strip()
    if not core:
        return inner
    lead = inner[:len(inner) - len(inner.lstrip())]
    trail = inner[len(inner.rstrip()):]
    return f"{lead}{marker}{core}{marker}{trail}"


def _code_span(inner: str) -> str:
    """Backtick span; widen the fence past any run inside the code."""
    text = _oneline(inner)
    if not text:
        return ""
    runs = re.findall(r"`+", text)
    fence = "`" * (max((len(r) for r in runs), default=0) + 1)
    pad = " " if (text.startswith("`") or text.endswith("`")) else ""
    return f"{fence}{pad}{text}{pad}{fence}"


def _inline_el(el: _Node, src: str, depth: int, in_code: bool,
               no_tables: bool = False) -> str:
    tag = el.tag
    if tag in _DROP:
        return ""
    if no_tables and tag == "table":
        # table-cell context: a nested table is its own block (the
        # tablex contract) — its text never folds into the parent cell
        return ""
    if depth > _MAX_DEPTH:
        return _flat(el, src)
    if tag == "br":
        return _BR
    if tag == "img":
        alt = _oneline(_esc(el.attrs.get("alt") or ""))
        target = (el.attrs.get("src") or "").strip()
        if not target:
            return alt
        return f"![{alt}]({_url(target)})"
    inner = _inline(el, src, depth + 1,
                    in_code or tag in _CODE_TAGS, no_tables)
    if tag == "a":
        href = (el.attrs.get("href") or "").strip()
        label = _oneline(inner)
        if not href or not label:
            return inner
        return f"[{label}]({_url(href)})"
    if tag in ("strong", "b"):
        return _wrap(inner, "**")
    if tag in ("em", "i"):
        return _wrap(inner, "*")
    if tag in ("del", "s", "strike"):
        return _wrap(inner, "~~")
    if tag in _CODE_TAGS and not in_code:
        return _code_span(inner)
    return inner


# --- block rendering ---------------------------------------------------------

def _raw_text(el: _Node, src: str) -> str:
    """Concatenated raw text of a subtree, entities unescaped,
    whitespace PRESERVED (the <pre> contract)."""
    parts: list[str] = []
    stack = [iter(el.children)]
    while stack:
        child = next(stack[-1], None)
        if child is None:
            stack.pop()
        elif isinstance(child, _Text):
            parts.append(src[child.start:child.end])
        elif child.tag == "br":
            parts.append("\n")
        elif child.tag not in _DROP:
            stack.append(iter(child.children))
    return _txt("".join(parts))


def _code_lang(el: _Node) -> str:
    """language-x class on the <pre> or its first <code> child."""
    for node in (el, *(c for c in el.children
                       if isinstance(c, _Node) and c.tag == "code")):
        m = _LANG_RE.search(node.attrs.get("class") or "")
        if m:
            return m.group(1).lower()
    return ""


def _fence_block(el: _Node, src: str) -> str:
    body = _raw_text(el, src).strip("\n")
    runs = re.findall(r"`{3,}", body)
    fence = "`" * max(3, max((len(r) for r in runs), default=0) + 1)
    return f"{fence}{_code_lang(el)}\n{body}\n{fence}"


def _table_block(el: _Node, src: str, depth: int) -> list[str]:
    rows = [e for e, _d in iter_elements(
                el, descend=lambda n: n.tag not in ("table", "td", "th"))
            if e.tag == "tr"]
    grid: list[list[str]] = []
    nested: list[_Node] = []
    for tr in rows:
        cells = []
        for cell in tr.children:
            if isinstance(cell, _Node) and cell.tag in ("td", "th"):
                text = _oneline(_inline(cell, src, depth + 1, False,
                                        no_tables=True))
                cells.append(text.replace("|", "\\|"))
                nested.extend(
                    e for e, _d in iter_elements(
                        cell, descend=lambda n: n.tag != "table")
                    if e.tag == "table")
        if cells:
            grid.append(cells)
    # a table inside a cell serializes as its own block after the
    # parent (the tablex contract: it is its own table, never cell text)
    tail = [b for t in nested for b in _table_block(t, src, depth + 1)]
    if not grid:
        return tail
    width = max(len(r) for r in grid)
    lines = []
    for i, row in enumerate(grid):
        row = row + [""] * (width - len(row))
        lines.append("| " + " | ".join(row) + " |")
        if i == 0:
            lines.append("|" + " --- |" * width)
    return ["\n".join(lines)] + tail


def _list_block(el: _Node, src: str, depth: int) -> list[str]:
    ordered = el.tag == "ol"
    lines: list[str] = []
    n = 0
    for child in el.children:
        if not isinstance(child, _Node) or child.tag in _DROP:
            continue
        if child.tag == "li":
            n += 1
            marker = f"{n}. " if ordered else "- "
            body = "\n".join(_blocks(child, src, depth + 1)) or ""
            item_lines = body.split("\n") if body else [""]
            pad = " " * len(marker)
            lines.append(marker + item_lines[0])
            lines.extend(pad + ln if ln else "" for ln in item_lines[1:])
        else:
            # stray non-<li> child: indented marker-less block
            for block in _block_el(child, src, depth + 1):
                lines.extend("  " + ln if ln else ""
                             for ln in block.split("\n"))
    return ["\n".join(lines)] if lines else []


def _quote_block(el: _Node, src: str, depth: int) -> list[str]:
    inner = "\n\n".join(_blocks(el, src, depth + 1))
    if not inner:
        return []
    return ["\n".join("> " + ln if ln else ">"
                      for ln in inner.split("\n"))]


def _block_el(el: _Node, src: str, depth: int) -> list[str]:
    tag = el.tag
    if tag in _DROP:
        return []
    if depth > _MAX_DEPTH:
        text = _flat(el, src)
        return [text] if text else []
    level = _HEADINGS.get(tag)
    if level:
        text = _oneline(_inline(el, src, depth + 1, False))
        return [f"{'#' * level} {text}"] if text else []
    if tag == "hr":
        return ["---"]
    if tag == "pre":
        return [_fence_block(el, src)]
    if tag == "table":
        return _table_block(el, src, depth)
    if tag in ("ul", "ol", "menu", "dir"):
        return _list_block(el, src, depth)
    if tag == "blockquote":
        return _quote_block(el, src, depth)
    if tag == "dt":
        text = _oneline(_inline(el, src, depth + 1, False))
        return [f"**{text}**"] if text else []
    # p, div, dd, section, ... : transparent block container
    return _blocks(el, src, depth + 1)


def _blocks(node: _Node, src: str, depth: int) -> list[str]:
    """Serialize a container's children: consecutive inline content
    folds into implicit paragraphs, block children stand alone."""
    out: list[str] = []
    pending: list[str] = []

    def flush() -> None:
        if pending:
            para = _collapse("".join(pending))
            pending.clear()
            if para:
                out.append(para)

    for child in node.children:
        if isinstance(child, _Text):
            pending.append(_esc(_txt(src[child.start:child.end])))
        elif child.tag in _BLOCK:
            flush()
            out.extend(_block_el(child, src, depth))
        elif child.tag not in _DROP:
            pending.append(_inline_el(child, src, depth, False))
    flush()
    return out


# --- public API --------------------------------------------------------------

def markdown_from_root(root: _Node, src: str) -> str:
    """to_markdown over an already-parsed tree (the one-parse hook)."""
    return "\n\n".join(_blocks(root, src, 0))


def to_markdown(payload) -> str:
    """Whole-document HTML -> GFM-subset markdown. Malformed pages
    degrade to whatever serializes, never raise (F5)."""
    if isinstance(payload, (bytes, bytearray, memoryview)):
        src = decode_payload(bytes(payload))
    else:
        src = payload or ""
    return markdown_from_root(parse_dom(src, full_attrs=True), src)
