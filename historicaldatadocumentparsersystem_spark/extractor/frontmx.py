"""Markdown front-matter parsing (Jekyll/Hugo YAML micro-subset) —
pure Python, stdlib only.

Static-site corpora (docs, blogs, READMEs) carry their metadata in a
leading ``---`` YAML block: title/date/tags/draft drive dedup keys,
temporal splits and quality gates. Full YAML is deliberately out of
scope; this is the deterministic micro-subset that covers real
Jekyll/Hugo front matter, shared by every engine.

Deterministic subset:
- the block must start at line 1 as exactly ``---`` (optional BOM,
  CRLF tolerated) and end at the first ``---`` or ``...`` line;
  an unterminated block means NO front matter (Jekyll's rule) and
  the whole document is body;
- ``key: value`` lines at indent 0 — key matches ``KEY_RE``; the
  value is trimmed with ONE layer of matching single/double quotes
  removed; an empty value opens a BLOCK LIST collected from
  following ``- item`` lines (items dequoted the same way);
- an inline list ``[a, b]`` splits on commas (no nested quoting);
  every list item gets its 0-based ``idx``; scalars have idx NULL;
- full-line ``#`` comments and blank lines are skipped; any other
  line (nested mappings, folded scalars, stray text) is IGNORED and
  closes a pending block list;
- duplicate keys: the LAST occurrence wins (PyYAML's dict
  behavior) — earlier rows are dropped whole (list and all).
"""

from __future__ import annotations

import re

KEY_RE = r"^([A-Za-z0-9_-]+):(.*)$"
_KEY = re.compile(KEY_RE)
_ITEM = re.compile(r"^[ \t]*- (.*)$")
_WS = " \t"


def _dequote(v: str) -> str:
    v = v.strip(_WS)
    if len(v) >= 2 and v[0] == v[-1] and v[0] in "'\"":
        return v[1:-1]
    return v


def parse_front_matter(text) -> tuple[list[tuple], int]:
    """Document text -> ([(pos, key, idx, value), ...],
    body_offset). ``pos`` is the key's emit order after last-wins
    dedup; ``idx`` is NULL for scalars, 0-based for list items.
    Returns ([], 0) when there is no front-matter block."""
    if not text:
        return [], 0
    if text.startswith("\ufeff"):
        text = text[1:]
        bom = 1
    else:
        bom = 0
    lines = text.split("\n")
    if lines[0].rstrip("\r") != "---":
        return [], 0
    # locate the terminator
    end = None
    for li in range(1, len(lines)):
        s = lines[li].rstrip("\r")
        if s in ("---", "..."):
            end = li
            break
    if end is None:
        return [], 0
    body_offset = bom + sum(len(l) + 1 for l in lines[:end + 1])
    body_offset = min(body_offset, bom + len(text))
    entries: dict[str, list] = {}
    order: list[str] = []
    pending: str | None = None
    for li in range(1, end):
        s = lines[li].rstrip("\r")
        st = s.strip(_WS)
        if st == "" or st.startswith("#"):
            pending = None
            continue
        m = _ITEM.match(s)
        if m and pending is not None:
            entries[pending].append(_dequote(m.group(1)))
            continue
        m = _KEY.match(s)
        if m is None:
            pending = None
            continue
        key, raw = m.group(1), m.group(2).strip(_WS)
        if key in entries:
            order.remove(key)           # last wins, drop whole
        order.append(key)
        pending = None
        if raw == "":
            entries[key] = []
            pending = key
        elif raw.startswith("[") and raw.endswith("]"):
            inner = raw[1:-1].strip(_WS)
            entries[key] = ([] if inner == "" else
                            [_dequote(p) for p in inner.split(",")])
        else:
            entries[key] = _dequote(raw)
    out: list[tuple] = []
    for pos, key in enumerate(order):
        v = entries[key]
        if isinstance(v, list):
            for idx, item in enumerate(v):
                out.append((pos, key, idx, item))
            if not v:
                out.append((pos, key, None, None))
        else:
            out.append((pos, key, None, v))
    return out, body_offset
