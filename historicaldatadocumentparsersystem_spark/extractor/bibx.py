"""BibTeX source parsing — pure Python, stdlib only.

Academic corpora ship citation databases as ``.bib`` files; mining
them (titles, authors, years, venues) feeds dedup keys and bitext/
citation-graph construction. From-scratch tokenizer over the BibTeX
grammar (no external parser), golden-pinned like the other
per-format loaders (rtfx/odtx precedent).

Deterministic subset:
- entries start at ``@`` + letters (type lowercased) + ``{`` or
  ``(``; anything between entries is an implicit comment;
- ``@comment{...}`` skips a BALANCED group; ``@preamble{...}``
  emits a single ``preamble`` field row; ``@string{name = value}``
  registers a macro (name lowercased, emits nothing);
- values are ``#``-concatenations of ``{braced}`` parts (braces
  nest; only the OUTERMOST layer is stripped), ``"quoted"`` parts
  (inner braces protect quotes), bare numbers, and macro names
  (substituted when defined, kept verbatim when not — lossless);
- field names lowercase; the FIRST occurrence of a duplicate field
  wins (bibtex's rule); a trailing comma before the closing
  delimiter is tolerated;
- whitespace runs inside values (incl. newlines) collapse to one
  space after concatenation; keys are trimmed;
- malformed entries (missing ``=``, unbalanced value, unterminated
  body) are DROPPED whole — later entries still parse;
- bytes decode strict-UTF-8 first, then cp1252 with replacement
  (the subx fallback).
"""

from __future__ import annotations

import re

_TYPE = re.compile(r"[A-Za-z]+")
_NAME = re.compile(r"[^=,{}()\" \t\r\n]+")
_WS_RUN = re.compile(r"[ \t\r\n]+")
_WS = " \t\r\n"


def _decode(payload: bytes) -> str:
    try:
        return payload.decode("utf-8")
    except UnicodeDecodeError:
        return payload.decode("cp1252", errors="replace")


def _collapse(v: str) -> str:
    return _WS_RUN.sub(" ", v).strip()


def _skip_ws(text: str, i: int) -> int:
    n = len(text)
    while i < n and text[i] in _WS:
        i += 1
    return i


def _parse_value(text: str, i: int, close: str,
                 strings: dict) -> tuple[str | None, int, bool]:
    """One ``#``-concatenated value starting at ``i``. Returns
    (raw_value, next_i, ok); ok=False on an unbalanced part."""
    n = len(text)
    parts: list[str] = []
    while True:
        i = _skip_ws(text, i)
        if i >= n:
            return None, i, False
        c = text[i]
        if c == "{":
            depth, j = 1, i + 1
            while j < n and depth:
                if text[j] == "{":
                    depth += 1
                elif text[j] == "}":
                    depth -= 1
                j += 1
            if depth:
                return None, j, False
            parts.append(text[i + 1:j - 1])
            i = j
        elif c == '"':
            depth, j = 0, i + 1
            while j < n:
                ch = text[j]
                if ch == "{":
                    depth += 1
                elif ch == "}":
                    depth -= 1
                elif ch == '"' and depth == 0:
                    break
                j += 1
            if j >= n:
                return None, j, False
            parts.append(text[i + 1:j])
            i = j + 1
        else:
            j = i
            while (j < n and text[j] not in " \t\r\n,#}"
                   and text[j] != close):
                j += 1
            tok = text[i:j]
            if not tok:
                return None, j, False
            if tok[0].isdigit():
                parts.append(tok)
            else:
                parts.append(strings.get(tok.lower(), tok))
            i = j
        i = _skip_ws(text, i)
        if i < n and text[i] == "#":
            i += 1
            continue
        return "".join(parts), i, True


def extract_bib_entries(payload) -> list[dict]:
    """.bib payload (bytes or str) -> [{pos, entry_type, key,
    fields: [(name, value), ...]}] in document order. ``preamble``
    entries carry key None and one ('preamble', value) field."""
    text = _decode(payload) if isinstance(payload, (bytes,
                                                    bytearray)) \
        else (payload or "")
    n = len(text)
    out: list[dict] = []
    strings: dict[str, str] = {}
    i = 0
    while True:
        at = text.find("@", i)
        if at < 0:
            break
        i = at + 1
        m = _TYPE.match(text, i)
        if not m:
            continue
        kind = m.group(0).lower()
        i = _skip_ws(text, m.end())
        if i >= n or text[i] not in "{(":
            continue
        close = "}" if text[i] == "{" else ")"
        opener = text[i]
        i += 1
        if kind == "comment":
            depth = 1
            while i < n and depth:
                if text[i] == opener:
                    depth += 1
                elif text[i] == close:
                    depth -= 1
                i += 1
            continue
        if kind == "preamble":
            val, i, ok = _parse_value(text, i, close, strings)
            if ok:
                i = _skip_ws(text, i)
                if i < n and text[i] == close:
                    i += 1
                    out.append({"entry_type": "preamble",
                                "key": None,
                                "fields": [("preamble",
                                            _collapse(val))]})
            continue
        if kind == "string":
            i = _skip_ws(text, i)
            m2 = _NAME.match(text, i)
            if not m2:
                continue
            name = m2.group(0).lower()
            i = _skip_ws(text, m2.end())
            if i >= n or text[i] != "=":
                continue
            val, i, ok = _parse_value(text, i + 1, close, strings)
            if ok:
                i = _skip_ws(text, i)
                if i < n and text[i] == close:
                    i += 1
                    strings[name] = val
            continue
        # regular entry: key, then comma-led fields. On a malformed
        # entry, rescan from just past its '@' so entries the broken
        # value scan swallowed still parse (drop-and-recover).
        ent_at = at
        j = i
        while j < n and text[j] != "," and text[j] != close:
            j += 1
        if j >= n:
            break                       # unterminated at EOF: drop
        key = text[i:j].strip(_WS)
        i = j
        fields: list[tuple[str, str]] = []
        seen: set[str] = set()
        ok_entry = True
        while i < n and text[i] == ",":
            i = _skip_ws(text, i + 1)
            if i < n and text[i] == close:
                break                   # trailing comma
            m2 = _NAME.match(text, i)
            if not m2:
                ok_entry = False
                break
            fname = m2.group(0).lower()
            i = _skip_ws(text, m2.end())
            if i >= n or text[i] != "=":
                ok_entry = False
                break
            val, i, ok = _parse_value(text, i + 1, close, strings)
            if not ok:
                ok_entry = False
                break
            if fname not in seen:
                seen.add(fname)
                fields.append((fname, _collapse(val)))
            i = _skip_ws(text, i)
        if not ok_entry:
            i = ent_at + 1
            continue
        if i < n and text[i] == close:
            i += 1
            out.append({"entry_type": kind, "key": key,
                        "fields": fields})
        else:
            i = ent_at + 1              # missing close: drop+recover
    for pos, e in enumerate(out):
        e["pos"] = pos
    return out
