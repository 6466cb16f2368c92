"""Gettext PO-file reader — pure Python, stdlib only, Spark-free.

Parallel-corpus member of the per-format loader family: .po
translation catalogs are the densest open bitext channel on the web
(every l10n'd project publishes them), and a training-data pipeline
mines them into (source, target) sentence pairs. The reference's
loader family (``loaders.py``) dispatches per format; this module is
the bitext analog, golden-pinned like the other loaders.

Deterministic subset of the gettext grammar (msgfmt's reading):
- an entry is a run of ``msgctxt`` / ``msgid`` / ``msgid_plural`` /
  ``msgstr`` / ``msgstr[N]`` keyword lines, each followed by any
  number of bare ``"..."`` continuation lines appended to the last
  keyword; entries end where the next ``msgid``/``msgctxt`` begins
  after at least one msgstr was seen (blank lines and comments
  never join strings across entries);
- comment lines: ``#,`` flags (comma/space separated — ``fuzzy``
  is the one that matters), ``#:`` source references
  (whitespace-separated, accumulated), other ``#`` comments
  skipped; ``#~`` obsolete entries are parsed but flagged;
- string literals decode the C escapes ``\\n \\t \\r \\\\ \\"
  \\a \\b \\f \\v \\0``; an unknown escape keeps the backslash and
  the char verbatim (lenient, never raises);
- the header entry (``msgid ""`` first in the file) is emitted at
  pos 0 like any other entry; its msgstr carries the
  ``Key: value\\n`` metadata block — ``header_fields`` parses it
  (first occurrence of a key wins, keys case-sensitive);
- an entry with ``msgid_plural`` emits msgstr = msgstr[0] (the
  singular slot) and ``n_plurals`` = number of msgstr[N] forms; a
  malformed entry (keyword without a valid string, msgstr before
  msgid) drops that entry and rescans at the next entry start.
"""

from __future__ import annotations

import re

_KEY_RE = re.compile(
    r"^(msgctxt|msgid_plural|msgid|msgstr(?:\[(\d+)\])?)\s+(.*)$")
_HDR_RE = re.compile(r"^([A-Za-z0-9-]+):\s*(.*)$")

_ESC = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\", '"': '"',
        "a": "\a", "b": "\b", "f": "\f", "v": "\v", "0": "\0"}


def _unescape(s: str) -> str:
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            nxt = s[i + 1]
            if nxt in _ESC:
                out.append(_ESC[nxt])
                i += 2
                continue
            out.append(c)
            out.append(nxt)
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _str_lit(s: str) -> str | None:
    """The quoted part of a keyword/continuation line, decoded;
    None when the line is not a (complete) string literal."""
    s = s.strip()
    if len(s) < 2 or not s.startswith('"') or not s.endswith('"'):
        return None
    # the closing quote must not be escaped: count trailing
    # backslashes before it
    body = s[1:-1]
    bs = 0
    while bs < len(body) and body[-1 - bs] == "\\":
        bs += 1
    if bs % 2 == 1:
        return None
    return _unescape(body)


def _decode(payload) -> str:
    if payload is None:
        return ""
    if isinstance(payload, str):
        return payload
    try:
        return payload.decode("utf-8")
    except UnicodeDecodeError:
        return payload.decode("cp1252", errors="replace")


def extract_po_entries(payload) -> list[dict]:
    """PO payload (bytes/str) -> ordered entries:
    {pos, ctxt, msgid, msgid_plural, msgstr, n_plurals, fuzzy,
    obsolete, refs}. ``msgstr`` for a plural entry is the [0] form;
    ``refs`` is the accumulated ``#:`` reference list."""
    text = _decode(payload)
    entries: list[dict] = []

    # pending state for the entry being assembled
    parts: dict[str, list[str]] = {}
    plural_forms: dict[int, list[str]] = {}
    cur: list[str] | None = None   # continuation target
    fuzzy = False
    obsolete = False
    refs: list[str] = []
    bad = False

    def flush():
        nonlocal parts, plural_forms, cur, fuzzy, obsolete, refs, bad
        if not bad and "msgid" in parts and (
                "msgstr" in parts or plural_forms):
            n_pl = len(plural_forms)
            if plural_forms:
                msgstr = "".join(plural_forms.get(0, []))
            else:
                msgstr = "".join(parts["msgstr"])
            entries.append({
                "pos": len(entries),
                "ctxt": ("".join(parts["msgctxt"])
                         if "msgctxt" in parts else None),
                "msgid": "".join(parts["msgid"]),
                "msgid_plural": ("".join(parts["msgid_plural"])
                                 if "msgid_plural" in parts
                                 else None),
                "msgstr": msgstr,
                "n_plurals": n_pl,
                "fuzzy": fuzzy,
                "obsolete": obsolete,
                "refs": list(refs),
            })
        parts, plural_forms, cur = {}, {}, None
        fuzzy, obsolete, refs, bad = False, False, [], False

    def saw_msgstr() -> bool:
        return "msgstr" in parts or bool(plural_forms)

    for raw in text.splitlines():
        line = raw.strip()
        ob = False
        if line.startswith("#~"):
            ob = True
            line = line[2:].strip()
        if not line:
            # blank line = entry boundary: a malformed entry is
            # dropped here and the parser rescans clean
            cur = None
            if parts or plural_forms or bad:
                flush()
            continue
        if line.startswith("#"):
            cur = None
            if line.startswith("#,"):
                flags = [f.strip() for f in
                         re.split(r"[,\s]+", line[2:]) if f.strip()]
                if "fuzzy" in flags:
                    if saw_msgstr():
                        flush()
                    fuzzy = True
            elif line.startswith("#:"):
                if saw_msgstr():
                    flush()
                refs.extend(line[2:].split())
            continue
        m = _KEY_RE.match(line)
        if m:
            key, pidx, rest = m.group(1), m.group(2), m.group(3)
            lit = _str_lit(rest)
            if key in ("msgid", "msgctxt") and saw_msgstr():
                flush()
            if ob:
                obsolete = True
            if lit is None:
                bad = True
                cur = None
                continue
            if pidx is not None:
                idx = int(pidx)
                if idx > 99:   # attribute-fed index clamp
                    bad = True
                    cur = None
                    continue
                plural_forms[idx] = [lit]
                cur = plural_forms[idx]
            elif key == "msgstr":
                parts["msgstr"] = [lit]
                cur = parts["msgstr"]
            else:
                if key in parts:   # duplicate keyword: malformed
                    bad = True
                    cur = None
                    continue
                parts[key] = [lit]
                cur = parts[key]
            continue
        lit = _str_lit(line)
        if lit is not None and cur is not None:
            cur.append(lit)
            continue
        # stray line inside an entry: drop the entry, rescan
        if parts or plural_forms:
            bad = True
        cur = None
    flush()
    return entries


def header_fields(msgstr: str) -> dict[str, str]:
    """The header entry's metadata block -> {key: value}; first
    occurrence of a key wins."""
    out: dict[str, str] = {}
    for line in msgstr.split("\n"):
        m = _HDR_RE.match(line.strip())
        if m and m.group(1) not in out:
            out[m.group(1)] = m.group(2).strip()
    return out


def build_po(entries: list[dict], header: dict[str, str] | None
             = None, width: int = 0) -> str:
    """Encode half (fixtures): entries with the extract_po_entries
    keys (refs/fuzzy/obsolete/ctxt/plurals optional). ``width`` > 0
    wraps msgid/msgstr bodies into continuation lines every
    ``width`` chars (the multi-line literal shape)."""
    def enc(s: str) -> str:
        body = (s.replace("\\", "\\\\").replace('"', '\\"')
                .replace("\n", "\\n").replace("\t", "\\t"))
        return f'"{body}"'

    def lit_lines(key: str, s: str) -> list[str]:
        if width and len(s) > width:
            chunks = [s[i:i + width]
                      for i in range(0, len(s), width)]
            return [f'{key} ""'] + [enc(c) for c in chunks]
        return [f"{key} {enc(s)}"]

    blocks: list[str] = []
    if header is not None:
        hdr = "".join(f"{k}: {v}\n" for k, v in header.items())
        blocks.append("msgid \"\"\n" + "\n".join(
            lit_lines("msgstr", hdr)))
    for e in entries:
        lines: list[str] = []
        for ref in e.get("refs", []):
            lines.append(f"#: {ref}")
        if e.get("fuzzy"):
            lines.append("#, fuzzy")
        pre = "#~ " if e.get("obsolete") else ""
        if e.get("ctxt") is not None:
            lines += [pre + x for x in
                      lit_lines("msgctxt", e["ctxt"])]
        lines += [pre + x for x in lit_lines("msgid", e["msgid"])]
        if e.get("msgid_plural") is not None:
            lines += [pre + x for x in
                      lit_lines("msgid_plural", e["msgid_plural"])]
            for i in range(e.get("n_plurals", 2)):
                val = e["msgstr"] if i == 0 else \
                    e.get(f"msgstr_{i}", e["msgstr"] + f" #{i}")
                lines += [pre + x for x in
                          lit_lines(f"msgstr[{i}]", val)]
        else:
            lines += [pre + x for x in
                      lit_lines("msgstr", e["msgstr"])]
        blocks.append("\n".join(lines))
    return "\n\n".join(blocks) + "\n"
