"""freedesktop .desktop / INI-style entry reader — pure Python over
the published Desktop Entry Specification, Spark-free.

Linux app directories and web-served software repos carry these;
the shape is the INI dialect with spec quirks the generic parsers
get wrong: ``[Group]`` headers (byte-exact, case-sensitive),
``Key[locale]=Value`` localized keys (locale split off and kept),
``#`` comments only at line start, no quoting, backslash escapes
(\\s space, \\n, \\t, \\r, \\\\) applied to STRING-typed values,
duplicate key within a group = spec violation -> FIRST wins,
semicolon-terminated list values split with \\; escapes honored.

One row per (group, key, locale, value) — the bibtex_fields flat
shape. ``desktop_profile`` reads Type/Name/Exec/Categories off the
``Desktop Entry`` group.
"""

from __future__ import annotations

_ESC = {"s": " ", "n": "\n", "t": "\t", "r": "\r", "\\": "\\"}


def _unescape(v: str) -> str:
    out = []
    i = 0
    while i < len(v):
        c = v[i]
        if c == "\\" and i + 1 < len(v) and v[i + 1] in _ESC:
            out.append(_ESC[v[i + 1]])
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def split_list(v: str) -> list[str]:
    """semicolon list with \\; escapes; trailing ; terminates."""
    out = []
    cur = []
    i = 0
    while i < len(v):
        c = v[i]
        if c == "\\" and i + 1 < len(v) and v[i + 1] == ";":
            cur.append(";")
            i += 2
            continue
        if c == ";":
            out.append("".join(cur))
            cur = []
            i += 1
            continue
        cur.append(c)
        i += 1
    if cur:
        out.append("".join(cur))
    return out


def parse_desktop(payload) -> list[tuple]:
    """bytes/str -> [(pos, group, key, locale, value)]; [] for
    junk (no group header before the first entry). Never raises.
    First-wins duplicate (group, key, locale)."""
    if payload is None:
        return []
    if isinstance(payload, (bytes, bytearray)):
        try:
            src = bytes(payload).decode("utf-8")
        except UnicodeDecodeError:
            src = bytes(payload).decode("latin-1")
    else:
        src = str(payload)
    rows: list[tuple] = []
    seen: set[tuple] = set()
    group = None
    for raw in src.split("\n"):
        line = raw.rstrip("\r")
        if not line.strip() or line.lstrip().startswith("#"):
            continue
        s = line.strip()
        if s.startswith("[") and s.endswith("]"):
            group = s[1:-1]
            continue
        if group is None or "=" not in s:
            if group is None and "=" in s:
                return []        # entries before any group: junk
            continue
        key, _eq, val = s.partition("=")
        key = key.strip()
        val = val.strip()
        locale = None
        if key.endswith("]") and "[" in key:
            key, _b, loc = key.partition("[")
            locale = loc[:-1]
        if not key:
            continue
        sig = (group, key, locale)
        if sig in seen:          # spec violation: first wins
            continue
        seen.add(sig)
        rows.append((len(rows), group, key, locale,
                     _unescape(val)))
    return rows


# --- encode half (fixtures) --------------------------------------------------

def build_desktop(groups: list[tuple[str, list[tuple]]]) -> bytes:
    """[(group, [(key, locale|None, value)])] -> bytes."""
    lines = ["# generated fixture"]
    for gname, entries in groups:
        lines.append(f"[{gname}]")
        for key, locale, value in entries:
            k = f"{key}[{locale}]" if locale else key
            lines.append(f"{k}={value}")
        lines.append("")
    return "\n".join(lines).encode("utf-8")
