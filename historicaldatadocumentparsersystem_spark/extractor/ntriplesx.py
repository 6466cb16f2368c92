"""N-Triples (RDF 1.1) reader — pure Python, from scratch,
Spark-free.

The dump format of the linked-data web (Wikidata truthy dumps,
DBpedia, schema.org crawl extractions ship as .nt): one triple per
line, the THIRD member of the structured-data ecosystem next to
the in-page extractors (jsonldx / microdatax / rdfax). Line
grammar per the W3C spec:

- terms: ``<IRI>`` (no ws/control chars inside), ``_:label`` blank
  nodes, and literals ``"..."`` with optional ``@lang`` tag or
  ``^^<datatype>``;
- string escapes: ``\\t \\b \\n \\r \\f \\" \\' \\\\`` plus
  ``\\uXXXX`` / ``\\UXXXXXXXX`` numeric escapes (surrogate-range
  and out-of-range code points make the LINE malformed);
- a line is comment (leading ``#`` after optional ws), blank, or a
  triple ending with ``.``; malformed lines are SKIPPED and
  counted (dumps at scale always carry a few) — positions number
  the EMITTED triples.
"""

from __future__ import annotations

import re

_IRI_RE = re.compile(r"<([^<>\"{}|^`\\\x00-\x20]*)>")
_BNODE_RE = re.compile(r"_:([A-Za-z0-9][A-Za-z0-9._-]*)")
_LIT_RE = re.compile(r'"((?:[^"\\\n\r]|\\.)*)"')
_LANG_RE = re.compile(r"@([a-zA-Z]+(?:-[a-zA-Z0-9]+)*)")
_ESC = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
        '"': '"', "'": "'", "\\": "\\"}


def _unescape(s: str) -> str | None:
    out = []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch != "\\":
            out.append(ch)
            i += 1
            continue
        if i + 1 >= n:
            return None
        e = s[i + 1]
        if e in _ESC:
            out.append(_ESC[e])
            i += 2
        elif e in ("u", "U"):
            width = 4 if e == "u" else 8
            hexs = s[i + 2:i + 2 + width]
            if len(hexs) != width:
                return None
            try:
                cp = int(hexs, 16)
                out.append(chr(cp))
            except (ValueError, OverflowError):
                return None
            if 0xD800 <= cp <= 0xDFFF:
                return None
            i += 2 + width
        else:
            return None
    return "".join(out)


def _term(s: str, i: int, allow_literal: bool):
    """Parse one term at offset i -> (kind, value, lang, dtype,
    next_i) or None."""
    m = _IRI_RE.match(s, i)
    if m:
        return "iri", m.group(1), None, None, m.end()
    m = _BNODE_RE.match(s, i)
    if m:
        return "bnode", m.group(1), None, None, m.end()
    if allow_literal:
        m = _LIT_RE.match(s, i)
        if m:
            val = _unescape(m.group(1))
            if val is None:
                return None
            j = m.end()
            lang = dtype = None
            if s[j:j + 1] == "@":
                lm = _LANG_RE.match(s, j)
                if not lm:
                    return None
                lang = lm.group(1).lower()
                j = lm.end()
            elif s[j:j + 2] == "^^":
                dm = _IRI_RE.match(s, j + 2)
                if not dm:
                    return None
                dtype = dm.group(1)
                j = dm.end()
            return "literal", val, lang, dtype, j
    return None


def _ws(s: str, i: int) -> int:
    while i < len(s) and s[i] in " \t":
        i += 1
    return i


def parse_ntriples(payload) -> dict:
    """payload -> {"triples": [...], "n_malformed": int}; never
    raises. Each triple: (pos, subj, subj_kind, pred, obj,
    obj_kind, obj_lang, obj_datatype)."""
    out = {"triples": [], "n_malformed": 0}
    if payload is None:
        return out
    if isinstance(payload, (bytes, bytearray)):
        try:
            src = bytes(payload).decode("utf-8")
        except UnicodeDecodeError:
            return out
    else:
        src = str(payload)
    for line in src.splitlines():
        i = _ws(line, 0)
        if i >= len(line) or line[i] == "#":
            continue
        subj = _term(line, i, allow_literal=False)
        if not subj:
            out["n_malformed"] += 1
            continue
        i = _ws(line, subj[4])
        pred = _term(line, i, allow_literal=False)
        if not pred or pred[0] != "iri":
            out["n_malformed"] += 1
            continue
        i = _ws(line, pred[4])
        obj = _term(line, i, allow_literal=True)
        if not obj:
            out["n_malformed"] += 1
            continue
        i = _ws(line, obj[4])
        if line[i:i + 1] != "." or _ws(line, i + 1) != len(line):
            out["n_malformed"] += 1
            continue
        out["triples"].append((
            len(out["triples"]), subj[1], subj[0], pred[1],
            obj[1], obj[0], obj[2], obj[3]))
    return out


def escape_literal(s: str) -> str:
    """Encode half for fixtures (must round-trip)."""
    out = []
    for ch in s:
        if ch == "\\":
            out.append("\\\\")
        elif ch == '"':
            out.append('\\"')
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\t":
            out.append("\\t")
        elif ord(ch) < 0x20:
            out.append(f"\\u{ord(ch):04X}")
        else:
            out.append(ch)
    return "".join(out)
