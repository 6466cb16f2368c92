"""Microformats2 extraction (Spark-free, pure Python).

Microformats2 (``h-entry``/``h-card``/... class markup) is the fifth
structured-data syntax of the extruct surface — meta (metax), JSON-LD
(jsonldx), microdata (microdatax), RDFa (rdfax), and mf2 here. Blogs
and the IndieWeb annotate visible DOM with class tokens instead of
dedicated attributes; a corpus mining pass wants those (author,
publication entry, contact) records too.

Same one-parse satellite shape: this module is the correctness
oracle; the Spark operator (``operators/pagemeta.py:
extract_mf2_df``) calls the same functions from a mapInPandas batch,
so golden-parquet parity is structural.

Output: one flat row stream per page, ``(item_idx, parent_idx,
mf_type, prop_idx, prop, value, kind)``:

- an element whose class list contains an ``h-*`` token emits a
  DECLARATION row — ``kind='item'``, ``prop_idx=-1`` — carrying the
  FIRST ``h-*`` token as ``mf_type``; ``parent_idx`` is the
  enclosing item when the element ALSO carries property tokens (it
  is then a nested-item value, e.g. ``class="p-author h-card"``),
  else null;
- a nested item additionally emits on the PARENT one REF row per
  property token — ``kind='ref'``, ``value=str(child_idx)``,
  ``prop`` = the token with its prefix stripped;
- a plain property element inside an item emits one row per token,
  ``kind`` = the token prefix and ``prop`` = the suffix, value by
  the mf2 parsing rules: ``p-``: img→alt, abbr→title, data/input→
  value, else text; ``u-``: a/area/link→href, img/audio/video/
  source→src, object→data, else text (resolved against
  ``base_url``); ``dt-``: time/ins/del→datetime else text; ``e-``:
  the whitespace-normalized subtree text (inner-HTML capture is a
  downstream swap behind the same schema).

Determinism contract mirrors microdatax/rdfax: document-order items,
per-item ``prop_idx`` counter (``(item_idx, prop_idx)`` unique per
page), duplicate tokens within one class attribute dropped, child
declaration immediately before the parent's ref rows, property
classes outside any open item ignored, IMPLIED properties (the empty
h-card name/url/photo inference) out of scope (documented — they are
presentation-dependent and extruct-optional), malformed pages
degrade to fewer rows, never raise (F5).
"""
from __future__ import annotations

import re
from urllib.parse import urljoin

from .htmlx import decode_payload, iter_elements, parse_dom, subtree_text

_ROOT_RE = re.compile(r"^h-[a-z0-9]+(?:-[a-z0-9]+)*$")
_PROP_RE = re.compile(r"^(p|u|dt|e)-([a-z0-9]+(?:-[a-z0-9]+)*)$")

_U_ATTRS = {"a": "href", "area": "href", "link": "href",
            "img": "src", "audio": "src", "video": "src",
            "source": "src", "object": "data"}


def _classes(el) -> list[str]:
    seen: set[str] = set()
    out: list[str] = []
    for tok in (el.attrs.get("class") or "").split():
        if tok not in seen:
            seen.add(tok)
            out.append(tok)
    return out


def _prop_value(el, src: str, base_url: str | None, prefix: str) -> str:
    tag = el.tag
    if prefix == "p":
        if tag == "img" and el.attrs.get("alt") is not None:
            return el.attrs.get("alt")
        if tag == "abbr" and el.attrs.get("title") is not None:
            return el.attrs.get("title")
        if tag in ("data", "input") and el.attrs.get("value") is not None:
            return el.attrs.get("value")
    elif prefix == "u":
        attr = _U_ATTRS.get(tag)
        if attr is not None:
            raw = el.attrs.get(attr)
            if raw is not None:
                return urljoin(base_url, raw) if base_url else raw
    elif prefix == "dt":
        if tag in ("time", "ins", "del"):
            dt = el.attrs.get("datetime")
            if dt is not None:
                return dt
    return subtree_text(el, src)


def extract_mf2(payload, base_url: str | None = None) -> list[tuple]:
    """Flat microformats2 rows ``(item_idx, parent_idx, mf_type,
    prop_idx, prop, value, kind)`` for a page (see module contract)."""
    if isinstance(payload, (bytes, bytearray, memoryview)):
        src = decode_payload(bytes(payload))
    else:
        src = payload or ""
    return mf2_from_root(parse_dom(src, full_attrs=True), src, base_url)


def mf2_from_root(root, src: str, base_url: str | None = None
                  ) -> list[tuple]:
    """extract_mf2 over an already-parsed tree (the one-parse
    page_artifacts path shares the DOM across artifact families)."""
    rows: list[tuple] = []
    n_items = 0
    next_prop: list[int] = []
    open_items: list[tuple[int, int]] = []      # (depth, item_idx)

    def emit_prop(item: int, prop: str, value, kind: str) -> None:
        rows.append((item, None, None,
                     next_prop[item], prop, value, kind))
        next_prop[item] += 1

    for el, depth in iter_elements(root):
        while open_items and open_items[-1][0] >= depth:
            open_items.pop()
        classes = _classes(el)
        if not classes:
            continue
        roots = [c for c in classes if _ROOT_RE.match(c)]
        props = [m for c in classes if (m := _PROP_RE.match(c))]
        if not roots and not props:
            continue
        enclosing = open_items[-1][1] if open_items else None
        if roots:
            idx = n_items
            n_items += 1
            next_prop.append(0)
            is_nested = enclosing is not None and bool(props)
            rows.append((idx, enclosing if is_nested else None,
                         roots[0], -1, None, None, "item"))
            if is_nested:
                for m in props:
                    emit_prop(enclosing, m.group(2), str(idx), "ref")
            open_items.append((depth, idx))
        elif props and enclosing is not None:
            for m in props:
                value = _prop_value(el, src, base_url, m.group(1))
                emit_prop(enclosing, m.group(2), value, m.group(1))
    return rows
