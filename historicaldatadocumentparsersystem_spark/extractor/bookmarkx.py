"""Netscape bookmark file reader (NETSCAPE-Bookmark-file-1) — pure
Python, from scratch, Spark-free.

The export format every browser still emits ("Export bookmarks...")
and a curated-link discovery channel like llms.txt — each entry is
a human-chosen URL with a title, folder path, timestamps, and tags.

The format is NOT tree-clean HTML: ``<DT>`` and ``<p>`` are
customarily unclosed, so instead of the DOM builder this is a
linear token scan (the linkx style) over ``<DL>``/``</DL>``/
``<H3>``/``<A>`` events with an explicit folder stack:

- ``<H3 ...>title</H3>`` names the folder opened by the NEXT
  ``<DL>``; a ``<DL>`` without a pending H3 is anonymous (skipped
  in the path); the root list contributes no path segment;
- folder path = "/"-joined H3 titles (the opml category
  convention); stray ``</DL>`` beyond the stack is ignored;
- ``<A HREF=...>`` rows carry (pos, folder, href, title,
  add_date, last_modified, tags) — ADD_DATE/LAST_MODIFIED are
  epoch-second attributes (digit-gated, int64-clamped), TAGS is
  the comma-list attribute verbatim;
- titles/anchor text keep raw source slices whitespace-normalized
  (entities preserved — the linkx contract); tags/href are
  attribute values with one quote layer cut.
"""

from __future__ import annotations

import re

_TOKEN_RE = re.compile(
    r"<(/?)(dl|h3|a)\b([^>]*)>", re.I | re.S)
_DIGITS_RE = re.compile(r"^-?\d{1,15}$")


def _attr(attrs: str, name: str):
    m = re.search(
        rf"""\b{name}\s*=\s*("([^"]*)"|'([^']*)'|([^\s"'>]+))""",
        attrs, re.I)
    if not m:
        return None
    return m.group(2) if m.group(2) is not None else (
        m.group(3) if m.group(3) is not None else m.group(4))


def _epoch(attrs: str, name: str):
    v = _attr(attrs, name)
    if v is None or not _DIGITS_RE.match(v.strip()):
        return None
    n = int(v.strip())
    return n if 0 <= n <= 2**62 else None


def _norm(s: str) -> str:
    return " ".join(s.split())


def parse_bookmarks(payload) -> list[dict]:
    """payload -> one dict per <A> bookmark in document order;
    never raises (non-bookmark HTML just yields its <a> rows with
    empty folders — harmless; binary junk yields [])."""
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
    out: list[dict] = []
    stack: list[str | None] = []
    pending_h3: str | None = None
    pos_iter = _TOKEN_RE.finditer(src)
    for m in pos_iter:
        close, tag, attrs = (m.group(1), m.group(2).lower(),
                             m.group(3) or "")
        if tag == "dl":
            if close:
                if stack:
                    stack.pop()
            else:
                stack.append(pending_h3)
                pending_h3 = None
        elif tag == "h3" and not close:
            end = src.find("</", m.end())
            pending_h3 = _norm(src[m.end():end]) if end >= 0 else ""
        elif tag == "a" and not close:
            href = _attr(attrs, "href")
            if href is None:
                continue
            end = src.find("</", m.end())
            title = _norm(src[m.end():end]) if end >= 0 else ""
            folder = "/".join(f for f in stack if f)
            out.append({
                "pos": len(out),
                "folder": folder or None,
                "href": href,
                "title": title or None,
                "add_date": _epoch(attrs, "add_date"),
                "last_modified": _epoch(attrs, "last_modified"),
                "tags": _attr(attrs, "tags"),
            })
    return out


def build_bookmarks(items: list[dict]) -> bytes:
    """Encode half for fixtures. items are nested: {"folder": name,
    "children": [...]} or {"href": ..., "title": ..., ...}."""
    lines = [
        "<!DOCTYPE NETSCAPE-Bookmark-file-1>",
        '<META HTTP-EQUIV="Content-Type" '
        'CONTENT="text/html; charset=UTF-8">',
        "<TITLE>Bookmarks</TITLE>",
        "<H1>Bookmarks</H1>",
        "<DL><p>",
    ]

    def emit(entries, indent):
        pad = "    " * indent
        for e in entries:
            if "children" in e:
                ad = (f' ADD_DATE="{e["add_date"]}"'
                      if e.get("add_date") is not None else "")
                lines.append(f"{pad}<DT><H3{ad}>{e['folder']}</H3>")
                lines.append(f"{pad}<DL><p>")
                emit(e["children"], indent + 1)
                lines.append(f"{pad}</DL><p>")
            else:
                bits = [f'HREF="{e["href"]}"']
                for k in ("add_date", "last_modified"):
                    if e.get(k) is not None:
                        bits.append(f'{k.upper()}="{e[k]}"')
                if e.get("tags"):
                    bits.append(f'TAGS="{e["tags"]}"')
                lines.append(f"{pad}<DT><A {' '.join(bits)}>"
                             f"{e.get('title', '')}</A>")
    emit(items, 1)
    lines.append("</DL><p>")
    return "\n".join(lines).encode("utf-8")
