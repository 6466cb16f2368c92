"""CSS reference miner — pure Python, from scratch, Spark-free.

Stylesheets are a fetch-discovery channel the HTML satellites
can't see: ``@import`` pulls more CSS, ``url()`` pulls fonts /
images / cursors. This is a linear scanner (not a CSS object
model): comments are stripped STRING-AWARE first (``/*`` inside a
quoted string is content, a quote inside a comment is not), then
references are read left-to-right with their syntactic context.

Rows (pos, kind, url, is_data):
- ``kind='import'``: ``@import url(...)`` or ``@import "..."``;
- ``kind='font'``: ``url()`` inside an ``@font-face { }`` block
  (brace-depth tracked from the at-keyword);
- ``kind='asset'``: every other ``url()``;
- url value: one quote layer cut, surrounding whitespace trimmed,
  backslash escapes of quotes/parens resolved; empty urls drop;
- ``is_data``: ``data:`` scheme (census flag — the value is kept
  verbatim; fixtures keep them short).

``parse_css_refs`` never raises; non-text payloads yield [].
"""

from __future__ import annotations

import re

_URL_RE = re.compile(
    r"""url\(\s*(?:"((?:[^"\\]|\\.)*)"|'((?:[^'\\]|\\.)*)'"""
    r"""|((?:[^)\\\s]|\\.)*))\s*\)""", re.I)
_IMPORT_RE = re.compile(
    r"""@import\s+(?:url\(\s*(?:"((?:[^"\\]|\\.)*)"|"""
    r"""'((?:[^'\\]|\\.)*)'|((?:[^)\\\s]|\\.)*))\s*\)"""
    r"""|"((?:[^"\\]|\\.)*)"|'((?:[^'\\]|\\.)*)')""", re.I)
_FONTFACE_RE = re.compile(r"@font-face\b", re.I)
_ESC_RE = re.compile(r"\\(.)")


def strip_comments(src: str) -> str:
    """Remove /* */ runs outside strings; string bodies verbatim.
    Replaced by spaces so offsets stay monotonic."""
    out = []
    i, n = 0, len(src)
    while i < n:
        ch = src[i]
        if ch in "\"'":
            q = ch
            j = i + 1
            while j < n:
                if src[j] == "\\":
                    j += 2
                    continue
                if src[j] == q:
                    j += 1
                    break
                j += 1
            out.append(src[i:j])
            i = j
        elif ch == "/" and i + 1 < n and src[i + 1] == "*":
            end = src.find("*/", i + 2)
            end = n if end < 0 else end + 2
            out.append(" " * (end - i))
            i = end
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _clean(raw: str | None) -> str | None:
    if raw is None:
        return None
    v = _ESC_RE.sub(r"\1", raw).strip()
    return v or None


def _font_face_spans(src: str) -> list[tuple[int, int]]:
    spans = []
    for m in _FONTFACE_RE.finditer(src):
        i = src.find("{", m.end())
        if i < 0:
            continue
        depth, j = 1, i + 1
        while j < len(src) and depth:
            if src[j] == "{":
                depth += 1
            elif src[j] == "}":
                depth -= 1
            j += 1
        spans.append((i, j))
    return spans


def parse_css_refs(payload) -> list[dict]:
    if payload is None:
        return []
    if isinstance(payload, (bytes, bytearray)):
        try:
            src = bytes(payload).decode("utf-8")
        except UnicodeDecodeError:
            try:
                src = bytes(payload).decode("cp1252")
            except UnicodeDecodeError:
                return []
    else:
        src = str(payload)
    src = strip_comments(src)
    ff_spans = _font_face_spans(src)
    refs: list[tuple[int, str, str]] = []   # (offset, kind, url)
    # ONE string-aware linear walk: free-standing string literals
    # are content (``content: "url(x)"`` fetches nothing); url(...)
    # and @import consume their own quoted arguments
    i, n = 0, len(src)
    while i < n:
        ch = src[i]
        prev = src[i - 1] if i else " "
        if ch in "\"'":
            j = i + 1
            while j < n:
                if src[j] == "\\":
                    j += 2
                    continue
                if src[j] == ch:
                    j += 1
                    break
                j += 1
            i = j
        elif (ch in "uU" and src[i:i + 4].lower() == "url("
              and not (prev.isalnum() or prev in "-_@")):
            m = _URL_RE.match(src, i)
            if m:
                url = _clean(m.group(1) if m.group(1) is not None
                             else m.group(2)
                             if m.group(2) is not None
                             else m.group(3))
                if url:
                    kind = ("font" if any(a <= i < b
                                          for a, b in ff_spans)
                            else "asset")
                    refs.append((i, kind, url))
                i = m.end()
                continue
            i += 4
        elif ch == "@" and src[i:i + 7].lower() == "@import":
            m = _IMPORT_RE.match(src, i)
            if m:
                url = _clean(next((g for g in m.groups()
                                   if g is not None), None))
                if url:
                    refs.append((i, "import", url))
                i = m.end()
                continue
            i += 7
        else:
            i += 1
    return [{"pos": i, "kind": k, "url": u,
             "is_data": u.lower().startswith("data:")}
            for i, (_, k, u) in enumerate(refs)]
