"""Code-block extraction + programming-language identification
(Spark-free, pure Python).

Code is the highest-leverage minority class in a web-scale training
corpus: pipelines route ``<pre>`` blocks to a code subset (StarCoder /
The Stack style) instead of letting tokenizer-hostile source text
pollute the prose stream. The reference surfaces per-element structure
from its document loaders (its partitioners yield code/text elements);
this is the corpus-level pass producing one row per code BLOCK with a
language label so downstream SQL can build per-language mixtures.

Built on the fast scanner's full-attribute mode like linkx/tablex and
wired into the one-parse ``pagex`` pass (``code_from_root``). This
module is the correctness oracle: the Spark operator
(``operators/pagemeta.py:extract_code_df``) calls these functions from
a mapInPandas batch, so golden-parquet parity is structural.

Determinism contract:
- a code block is a ``<pre>`` element; ``<pre>`` nested inside another
  ``<pre>`` is part of the outer block's text, never its own block
  (the tablex nested-table rule, inverted: pre is a leaf here).
  Inline ``<code>``/``<kbd>``/``<samp>`` spans are prose typography,
  not blocks;
- block text is the subtree's raw text with whitespace PRESERVED,
  entities unescaped, NUL -> U+FFFD (the HTML5 rule, same as mdx's
  fence body), ``<br>`` -> newline, script/style dropped; leading and
  trailing newlines are stripped (HTML drops the newline right after
  ``<pre>``); blocks that are entirely whitespace are dropped;
- ``lang_hint`` is the first ``language-X`` / ``lang-X`` class token
  on the ``<pre>`` or its first ``<code>`` child (lowercased, None
  when absent) — a superset of mdx's fence-info rule (mdx emits only
  ``language-X``, verbatim, per the GFM info-string convention);
- ``lang`` is the hint normalized through the alias table when
  present, else the keyword heuristic ``guess_lang`` (fixed signature
  table, first-match-wins tiebreak, score >= 2 or ``unknown``);
- ``pos`` numbers emitted blocks densely from 0 in document order;
- malformed pages degrade to fewer blocks, never raise (F5).
"""
from __future__ import annotations

import json
import re
from html import unescape

from .htmlx import _Node, _Text, decode_payload, iter_elements, parse_dom

_DROP = ("script", "style", "template")

_HINT_RE = re.compile(r"(?:^|\s)lang(?:uage)?-([\w+.#-]+)", re.I)

# hint token -> canonical language (lowercased hint looked up here;
# unlisted hints pass through verbatim)
ALIASES = {
    "py": "python", "python3": "python", "py3": "python",
    "js": "javascript", "jsx": "javascript", "node": "javascript",
    "ts": "typescript", "tsx": "typescript",
    "c++": "cpp", "cxx": "cpp",
    "c#": "csharp", "cs": "csharp",
    "sh": "shell", "bash": "shell", "zsh": "shell", "console": "shell",
    "shell-session": "shell",
    "golang": "go",
    "yml": "yaml",
    "xhtml": "html",
    "plain": "text", "plaintext": "text", "none": "text", "txt": "text",
}

# (language, ((pattern, weight), ...)) — fixed order IS the tiebreak;
# score = sum of weights of patterns that match at least once.
_SIGNATURES = (
    ("python", ((r"\bdef \w+\s*\(", 2),
                (r"^(?:import \w+|from \w+ import )", 2),
                (r"\bself\b", 1),
                (r"\b(?:elif|None|True|False)\b", 1))),
    ("javascript", ((r"\bfunction\s*\w*\s*\(", 2),
                    (r"\b(?:const|let|var)\s+\w+\s*=", 2),
                    (r"=>", 1),
                    (r"\bconsole\.\w+\s*\(", 2),
                    (r"===|!==", 1))),
    ("java", ((r"\bpublic\s+(?:static\s+|final\s+)*(?:class|void|int|String)\b", 2),
              (r"\bSystem\.out\.print", 2),
              (r"\bnew \w+\s*\(", 1),
              (r"@Override\b", 2))),
    ("cpp", ((r"\bstd::", 2),
             (r"\b(?:cout|cin)\b", 2),
             (r"\btemplate\s*<", 2),
             (r"#include\s*<", 1))),
    ("c", ((r"#include\s*<", 2),
           (r"\bint main\s*\(", 2),
           (r"\bprintf\s*\(", 2),
           (r"\b(?:void|struct)\b", 1))),
    ("rust", ((r"\bfn \w+\s*[(<]", 2),
              (r"\blet mut\b", 2),
              (r"\bprintln!\s*\(", 2),
              (r"&str\b|&mut\b", 1))),
    ("go", ((r"\bfunc \w+\s*\(", 2),
            (r"^package \w+", 2),
            (r"\bfmt\.\w+\s*\(", 2),
            (r":=", 1))),
    ("sql", ((r"(?is)\bselect\b.*\bfrom\b", 2),
             (r"(?i)\b(?:insert into|create table|alter table)\b", 2),
             (r"(?i)\b(?:group by|order by|left join|inner join)\b", 1),
             (r"(?i)\bwhere\b", 1))),
    ("shell", ((r"\A#!/bin/(?:ba|z)?sh", 2),
               (r"^\s*(?:sudo|apt|grep|echo|curl|export|chmod|mkdir) ", 1),
               (r"\|\s*(?:grep|sort|head|awk|sed)\b", 2),
               (r"\$\{?\w+", 1))),
    ("css", ((r"[.#@]?[\w-]+\s*\{[^{}]*:[^{}]*\}", 2),
             (r"\b(?:color|margin|padding|font-size|display)\s*:", 2))),
    ("html", ((r"(?i)</?(?:div|span|html|body|p|a|ul|li)\b", 2),
              (r"(?i)<!doctype\b", 2))),
)
_COMPILED = tuple(
    (lang, tuple((re.compile(p, re.M), w) for p, w in pats))
    for lang, pats in _SIGNATURES)


def normalize_hint(hint: str) -> str:
    """Hint token -> canonical language name."""
    h = hint.lower()
    return ALIASES.get(h, h)


def guess_lang(text: str) -> str:
    """Keyword-signature language guess for unhinted blocks.

    JSON is decided structurally first (a keyword table can't see it);
    then the fixed signature table scores each language by which
    patterns match, the max wins (earlier table entry on ties), and
    anything scoring < 2 is ``unknown``. Pure function of the text —
    the golden parquet pins every verdict.
    """
    stripped = text.strip()
    if stripped[:1] in "{[":
        try:
            json.loads(stripped)
            return "json"
        except (ValueError, RecursionError):
            pass
    best, best_score = "unknown", 1
    for lang, pats in _COMPILED:
        score = sum(w for rx, w in pats if rx.search(text))
        if score > best_score:
            best, best_score = lang, score
    return best


def _hint_of(pre: _Node) -> str | None:
    """First language-X / lang-X class token on the <pre> or its first
    <code> child (mdx's fence-info rule, widened to lang-X)."""
    for node in (pre, *(c for c in pre.children
                        if isinstance(c, _Node) and c.tag == "code")):
        m = _HINT_RE.search(node.attrs.get("class") or "")
        if m:
            return m.group(1).lower()
    return None


def _raw_text(el: _Node, src: str) -> str:
    """Raw subtree text, whitespace preserved: entities unescaped,
    NUL -> U+FFFD, <br> -> newline, script/style/template dropped."""
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
    return unescape("".join(parts)).replace("\x00", "�")


def code_from_root(root: _Node, src: str) -> list[tuple]:
    """(pos, lang_hint, lang, n_lines, n_chars, text) per <pre> block
    (document order, nested pre folded into the outer block, empty
    blocks dropped)."""
    out: list[tuple] = []
    for el, _depth in iter_elements(
            root, descend=lambda e: e.tag != "pre"):
        if el.tag != "pre":
            continue
        text = _raw_text(el, src).strip("\n")
        if not text.strip():
            continue
        hint = _hint_of(el)
        lang = normalize_hint(hint) if hint else guess_lang(text)
        out.append((len(out), hint, lang,
                    text.count("\n") + 1, len(text), text))
    return out


def extract_code(payload) -> list[tuple]:
    """(pos, lang_hint, lang, n_lines, n_chars, text) for every code
    block in the document (bytes payloads decoded via the shared
    charset sniff)."""
    if isinstance(payload, (bytes, bytearray, memoryview)):
        src = decode_payload(bytes(payload))
    else:
        src = payload or ""
    return code_from_root(parse_dom(src, full_attrs=True), src)
