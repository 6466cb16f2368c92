"""llms.txt parsing (llmstxt.org proposal) — pure Python, stdlib
only.

Sites publish ``/llms.txt`` to tell LLM crawlers what matters: an
H1 title, a blockquote summary, and H2 sections of curated links
(the ``Optional`` section marks skippable ones). For a training-data
pipeline this is a first-class discovery surface — like sitemaps,
but quality-ranked by the site itself.

Deterministic subset (markdown-shaped, line-based):
- ``title`` = text of the FIRST ``# `` heading; ``summary`` = the
  first run of ``>`` blockquote lines (stripped, space-joined);
- ``## `` headings open sections (name trimmed); link items before
  any section carry section None;
- a link item matches ``ITEM_RE``: ``-`` or ``*`` bullet, then
  ``[name](href)`` and an optional ``: description``; href stops at
  the first ``)`` or whitespace; malformed items are ignored;
- ``pos`` is the 0-based emit order of kept links across the file;
- every other line is prose and is ignored.
"""

from __future__ import annotations

import re

ITEM_RE = (r"^[ \t]*[-*][ \t]+\[([^\]]*)\]\(([^) \t]*)\)"
           r"[ \t]*(?::[ \t]*(.*))?$")
H1_RE = r"^# [ \t]*(.*)$"
H2_RE = r"^## [ \t]*(.*)$"

_ITEM = re.compile(ITEM_RE)
_H1 = re.compile(H1_RE)
_H2 = re.compile(H2_RE)
_WS = " \t"


def parse_llms_txt(text) -> dict:
    """llms.txt text -> {title, summary, sections: [name, ...],
    links: [(pos, section, name, href, desc), ...]}."""
    title = None
    summary_parts: list[str] = []
    in_quote = False
    quote_done = False
    sections: list[str] = []
    links: list[tuple] = []
    section = None
    for raw in (text or "").split("\n"):
        line = raw.rstrip("\r")
        m = _H2.match(line)
        if m:
            section = m.group(1).strip(_WS)
            sections.append(section)
            in_quote = False
            continue
        m = _H1.match(line)
        if m:
            if title is None:
                title = m.group(1).strip(_WS)
            in_quote = False
            continue
        if line.lstrip(_WS).startswith(">"):
            if not quote_done:
                if not in_quote:
                    in_quote = True
                part = line.lstrip(_WS)[1:].strip(_WS)
                if part:
                    summary_parts.append(part)
            continue
        if in_quote:
            in_quote = False
            quote_done = True
        m = _ITEM.match(line)
        if m:
            name, href, desc = m.group(1), m.group(2), m.group(3)
            links.append((len(links), section, name, href,
                          desc.strip(_WS) if desc is not None
                          else None))
    return {"title": title,
            "summary": " ".join(summary_parts) or None,
            "sections": sections, "links": links}
