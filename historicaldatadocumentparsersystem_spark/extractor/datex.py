"""Publication-date extraction (htmldate analog; Spark-free).

A training corpus wants a timestamp per document — for temporal
dedup/decontamination splits, recency weighting, and knowledge-cutoff
filtering — and crawl payloads rarely carry a trustworthy HTTP date,
so pipelines mine the page itself (trafilatura ships htmldate for
exactly this). Reference analog: the engine's loaders keep document
metadata next to the body; the date is that metadata's temporal axis.

This module harvests CANDIDATES (the Spark operator emits all of
them; picking a winner is a downstream composition, so the policy
stays a plan, not a parser). Sources, in precedence order (``rank``):

- 0 ``meta``: ``<meta property="article:published_time">`` /
  ``name="date"|"publish-date"|"dc.date.issued"`` /
  ``itemprop="datePublished"`` content attributes, document order;
- 1 ``jsonld``: root-level ``datePublished`` of each VALID JSON-LD
  object block (list roots: first object element), block order;
- 2 ``time``: every ``<time datetime=...>`` attribute, document
  order;
- 3 ``url``: the first ``/YYYY/MM/DD/`` path segment run in the
  page's own URL;
- 4 ``text``: the FIRST ISO ``YYYY-MM-DD`` match in the
  whitespace-normalized VISIBLE document text (script/style subtrees
  excluded — a JSON-LD block must not double as a text candidate);
  conservative last resort.

Only candidates that normalize to a REAL calendar date survive:
``_norm_date`` accepts ``YYYY-MM-DD`` / ``YYYY/MM/DD`` (one- or
two-digit month/day) with an optional time tail (``T...`` or
`` HH:...``), years 1900-2099, validated via ``datetime.date`` —
``2024-13-40`` or ``2024-02-30`` yield no candidate. ``pos`` numbers
surviving candidates per page in (rank, source-order) emission order,
so ``(url, pos)`` is the unique key and "pick the winner" is simply
``min(pos)``. Malformed pages degrade to fewer rows, never raise
(F5 contract).
"""
from __future__ import annotations

import datetime as _dt
import json
import re

from .htmlx import decode_payload, iter_elements, parse_dom, subtree_text
from .jsonldx import jsonld_from_root

_META_NAMES = {"date", "publish-date", "dc.date.issued"}
_DATE_RE = re.compile(
    r"^(\d{4})[-/](\d{1,2})[-/](\d{1,2})(?:[T ].*)?$")
_URL_RE = re.compile(r"/((?:19|20)\d\d)/(\d{1,2})/(\d{1,2})(?:/|$)")
_TEXT_RE = re.compile(r"\b((?:19|20)\d\d)-(\d{2})-(\d{2})\b")

SOURCE_RANK = {"meta": 0, "jsonld": 1, "time": 2, "url": 3, "text": 4}


def _norm_date(raw) -> str | None:
    """ISO YYYY-MM-DD for a real 1900-2099 calendar date, else None."""
    if not raw or not isinstance(raw, str):
        return None
    m = _DATE_RE.match(raw.strip())
    if not m:
        return None
    y, mo, d = (int(g) for g in m.groups())
    if not 1900 <= y <= 2099:
        return None
    try:
        return _dt.date(y, mo, d).isoformat()
    except ValueError:
        return None


def extract_date_candidates(payload, base_url: str | None = None
                            ) -> list[tuple[int, str, str, str]]:
    """(pos, source, raw, date_iso) candidate rows per page (see
    module contract)."""
    if isinstance(payload, (bytes, bytearray, memoryview)):
        src = decode_payload(bytes(payload))
    else:
        src = payload or ""
    return dates_from_root(parse_dom(src, full_attrs=True), src, base_url)


def dates_from_root(root, src: str, base_url: str | None = None
                    ) -> list[tuple[int, str, str, str]]:
    """extract_date_candidates over an already-parsed tree (the
    one-parse page_artifacts path shares the DOM across families)."""
    found: list[tuple[str, str, str]] = []          # (source, raw, iso)

    def add(source: str, raw) -> None:
        iso = _norm_date(raw)
        if iso is not None:
            found.append((source, " ".join(str(raw).split()), iso))

    times: list = []
    for el, _depth in iter_elements(root):
        if el.tag == "meta":
            name = (el.attrs.get("name") or "").strip().lower()
            prop = (el.attrs.get("property") or "").strip().lower()
            iprop = (el.attrs.get("itemprop") or "").strip()
            if (prop == "article:published_time"
                    or name in _META_NAMES
                    or "datePublished" in iprop.split()):
                add("meta", el.attrs.get("content"))
        elif el.tag == "time":
            times.append(el.attrs.get("datetime"))
    for _idx, body, valid, _rtype, _ctx in jsonld_from_root(root, src):
        if not valid:
            continue
        try:
            doc = json.loads(body)
        except (ValueError, RecursionError):
            continue
        if isinstance(doc, list):
            doc = next((d for d in doc if isinstance(d, dict)), None)
        if isinstance(doc, dict):
            add("jsonld", doc.get("datePublished"))
    for dt in times:
        add("time", dt)
    if base_url:
        m = _URL_RE.search(base_url)
        if m:
            add("url", "/".join(m.groups()))
    m = _TEXT_RE.search(subtree_text(root, src,
                                     stop_tags=("script", "style")))
    if m:
        add("text", m.group(0))

    found.sort(key=lambda t: SOURCE_RANK[t[0]])     # stable: keeps order
    return [(pos, s, raw, iso)
            for pos, (s, raw, iso) in enumerate(found)]
