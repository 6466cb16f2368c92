"""MediaWiki wikitext reader — pure Python, from scratch.

Wikipedia dumps are the single most-reused web corpus; a crawl-scale
pipeline meets wikitext as raw page source (action=raw endpoints,
XML-dump <text> elements).  This member of the loader family emits
the SAME (para, kind, level, text) element schema the office/outline
extractors share, so heading-hierarchy section chunking
(``chunking.section_chunks``) composes for free, plus the internal
link stream for the link-graph family.

Deterministic subset (the stable core of the spec):

- ``<!-- -->`` comments removed (unterminated: to EOF)
- ``{{ }}`` templates removed entirely, nesting-aware (transclusion
  output is unknowable offline — dropping is the honest rendering)
- ``{| |}`` tables removed line-wise, nesting-aware
- ``<ref>..</ref>`` / ``<ref/>`` removed entirely; other HTML-ish
  tags are stripped keeping their content; ``<nowiki>`` content kept
  verbatim
- ``[[File:..]]`` / ``[[Image:..]]`` / ``[[Category:..]]`` removed
  (nesting-aware — captions carry links); ``[[t|label]]`` -> label,
  ``[[t]]`` -> t; pipe-trick ``[[ns:t|]]`` -> t
- ``[http://u label]`` -> label, ``[http://u]`` -> '' (numbered ref)
- ``'''``/``''`` emphasis markers removed; ``__MAGIC__`` words removed
- headings ``= H =`` .. ``====== H ======``: level = min(opening,
  closing run) like the MediaWiki parser's lenient rule (the longer
  run's surplus ``=`` is dropped from the title); list lines
  ``*``/``#``/``;``/``:`` with level = marker-run length; consecutive
  plain lines join into one paragraph (the renderer's behavior)

Spark-free like the rest of ``extractor/`` (it IS the oracle; the
Spark source calls the same functions per row).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

KIND_HEADING = "heading"
KIND_LIST_ITEM = "list_item"
KIND_TEXT = "text"

_DROP_PREFIXES = ("file:", "image:", "category:")


@dataclass
class WikiElement:
    para: int
    kind: str      # heading | list_item | text
    level: int     # heading level / list nesting depth; 0 = text
    text: str


@dataclass
class WikiLink:
    pos: int       # 0-based link index in document order
    target: str    # link target, first letter case preserved
    label: str     # rendered text


_COMMENT = re.compile(r"<!--.*?(?:-->|\Z)", re.S)
_REF = re.compile(r"<ref[^>/]*/\s*>|<ref[^>]*>.*?(?:</ref\s*>|\Z)",
                  re.S | re.I)
_NOWIKI = re.compile(r"<nowiki\s*>(.*?)</nowiki\s*>", re.S | re.I)
_TAG = re.compile(r"</?[A-Za-z][^>]*>")
_MAGIC = re.compile(r"__[A-Z]+__")
_EXT_LINK = re.compile(r"\[(?:https?|ftp)://[^\s\]]+([^\]]*)\]")
_HEADING = re.compile(r"^(=+)(.*?)(=+)\s*$")
_WS = re.compile(r"[ \t]+")


def _drop_nested(src: str, open_tok: str, close_tok: str) -> str:
    """Remove nesting-aware ``open_tok .. close_tok`` regions; an
    unterminated region runs to EOF (the comment rule)."""
    out: list[str] = []
    depth = 0
    i, n = 0, len(src)
    lo, lc = len(open_tok), len(close_tok)
    while i < n:
        if src.startswith(open_tok, i):
            depth += 1
            i += lo
        elif depth and src.startswith(close_tok, i):
            depth -= 1
            i += lc
        elif depth:
            i += 1
        else:
            out.append(src[i])
            i += 1
    return "".join(out)


def _strip_tables(src: str) -> str:
    """Drop table blocks: lines from a ``{|`` opener through its
    matching ``|}`` closer, nesting-aware."""
    out: list[str] = []
    depth = 0
    for line in src.split("\n"):
        s = line.lstrip()
        if s.startswith("{|"):
            depth += 1
            continue
        if depth:
            if s.startswith("|}"):
                depth -= 1
                if depth == 0:
                    # a table is a block: it breaks the paragraph
                    out.append("")
            continue
        out.append(line)
    return "\n".join(out)


def _inline(chunk: str, links: list[WikiLink] | None) -> str:
    """Inline wikitext -> plain text for one already-classified
    chunk; internal links append to ``links`` when given."""

    def _link(m: re.Match) -> str:
        inner = m.group(1)
        # image/file/category: drop whole construct (caption included)
        low = inner.lstrip().lower()
        if any(low.startswith(p) for p in _DROP_PREFIXES):
            return ""
        target, pipe, label = inner.partition("|")
        target = _WS.sub(" ", target).strip()
        if pipe and not label.strip():
            # pipe trick: [[ns:Target|]] renders "Target"
            label = target.rpartition(":")[2]
        text = (label.strip() if pipe else target) or target
        if links is not None and target:
            links.append(WikiLink(len(links), target, text))
        return text

    # innermost-first: caption links inside a [[File:...]] construct
    # resolve (and register) before the container is dropped — the
    # MediaWiki behavior, where thumbnail captions render their links
    prev = None
    while prev != chunk:
        prev = chunk
        chunk = re.sub(r"\[\[([^\[\]]*)\]\]", _link, chunk)

    def _ext(m: re.Match) -> str:
        return m.group(1).strip()

    chunk = _EXT_LINK.sub(_ext, chunk)
    chunk = chunk.replace("'''", "").replace("''", "")
    chunk = _TAG.sub("", chunk)
    chunk = _MAGIC.sub("", chunk)
    return _WS.sub(" ", chunk).strip()


def parse_wikitext(src: str, links: list[WikiLink] | None = None
                   ) -> list[WikiElement]:
    """Ordered elements in the shared office/outline schema."""
    if not src:
        return []
    src = src.replace("\x00", "�")  # NUL is the sentinel (mdx rule)
    src = _COMMENT.sub("", src)
    # protect nowiki bodies behind NUL sentinels so the inline pass
    # never re-parses them (the spec's whole point), restore at emit
    protected: list[str] = []

    def _shelter(m: re.Match) -> str:
        protected.append(m.group(1))
        return f"\x00{len(protected) - 1}\x00"

    src = _NOWIKI.sub(_shelter, src)
    src = _REF.sub("", src)
    src = _drop_nested(src, "{{", "}}")
    src = _strip_tables(src)

    out: list[WikiElement] = []
    para = 0
    _sentinel = re.compile("\x00([0-9]+)\x00")

    def emit(kind: str, level: int, raw: str) -> None:
        nonlocal para
        text = _inline(raw, links)
        text = _sentinel.sub(
            lambda m: protected[int(m.group(1))], text).strip()
        if text:
            out.append(WikiElement(para, kind, level, text))
            para += 1

    plain: list[str] = []

    def flush() -> None:
        nonlocal plain
        if plain:
            emit(KIND_TEXT, 0, " ".join(plain))
            plain = []

    for line in src.split("\n"):
        stripped = line.strip()
        if not stripped:
            flush()
            continue
        m = _HEADING.match(stripped)
        if m and m.group(2).strip():
            flush()
            level = min(len(m.group(1)), len(m.group(3)), 6)
            emit(KIND_HEADING, level, m.group(2))
            continue
        if stripped[0] in "*#;:":
            flush()
            depth = len(stripped) - len(stripped.lstrip("*#;:"))
            emit(KIND_LIST_ITEM, depth, stripped[depth:])
            continue
        plain.append(stripped)
    flush()
    return out


def wiki_links(src: str) -> list[WikiLink]:
    """Internal links in document order (File:/Image:/Category:
    excluded, template/table/ref link positions excluded — they do
    not render)."""
    links: list[WikiLink] = []
    parse_wikitext(src or "", links)
    return links


def extract_wikitext(src: str) -> tuple[str, list[tuple[int, int, str]]]:
    """A1 form: elements joined with "\\n", one span per element
    labeled by kind."""
    parts: list[str] = []
    spans: list[tuple[int, int, str]] = []
    pos = 0
    for el in parse_wikitext(src or ""):
        if parts:
            pos += 1
        spans.append((pos, pos + len(el.text), el.kind))
        parts.append(el.text)
        pos += len(el.text)
    return "\n".join(parts), spans


# --- MediaWiki XML dump container ----------------------------------------------

@dataclass
class WikiPage:
    idx: int        # 0-based page index in dump order
    title: str
    ns: int         # namespace (0 = articles)
    page_id: int    # -1 when absent
    redirect: str   # redirect target ('' when not a redirect)
    wikitext: str   # latest-revision text


def is_wiki_dump(payload: bytes | None) -> bool:
    """Cheap probe: XML prefix plus the mediawiki export root element
    within the first KB."""
    if not payload:
        return False
    head = payload[:1024].lstrip(b" \t\r\n\x0c\xef\xbb\xbf")
    return head.startswith(b"<") and b"<mediawiki" in head


def parse_wiki_dump(payload: bytes | None) -> list[WikiPage]:
    """Pages from a MediaWiki export dump (the format Wikipedia ships
    as pages-articles.xml): per <page>, the title, namespace, id,
    redirect target and the FIRST <revision>'s <text> (articles dumps
    carry exactly one).  Degrades to [] on junk (F5); parsing is
    stdlib ElementTree with namespace-agnostic tag matching, the
    feedx convention."""
    if not is_wiki_dump(payload):
        return []
    from xml.etree import ElementTree as ET
    try:
        root = ET.fromstring(payload.decode("utf-8", errors="replace"))
    except (ET.ParseError, ValueError, LookupError):
        return []

    def local(tag: str) -> str:
        return tag.rpartition("}")[2]

    out: list[WikiPage] = []
    for el in root.iter():
        if local(el.tag) != "page":
            continue
        title, ns, pid, redirect, text = "", 0, -1, "", ""
        seen_rev = False
        for child in el.iter():
            t = local(child.tag)
            if t == "title" and not title:
                title = (child.text or "").strip()
            elif t == "ns":
                try:
                    ns = int((child.text or "0").strip())
                except ValueError:
                    ns = 0
            elif t == "id" and pid < 0:
                # first <id> under <page> in document order is the
                # page id (revision ids come later)
                try:
                    pid = int((child.text or "-1").strip())
                except ValueError:
                    pid = -1
            elif t == "redirect" and not redirect:
                redirect = (child.get("title") or "").strip()
            elif t == "revision" and not seen_rev:
                seen_rev = True
                for sub in child.iter():
                    if local(sub.tag) == "text":
                        text = sub.text or ""
                        break
        out.append(WikiPage(len(out), title, ns, pid, redirect, text))
    return out
