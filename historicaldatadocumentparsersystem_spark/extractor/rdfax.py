"""RDFa Lite structured-data extraction (Spark-free, pure Python).

RDFa Lite (``vocab``/``typeof``/``property`` attributes) is the
fourth structured-data syntax next to meta tags (metax), JSON-LD
(jsonldx) and microdata (microdatax) — together they are the extruct
surface a schema.org mining pipeline consumes. Publishers on Drupal/
government sites lean RDFa where commerce leans microdata; a corpus
pass needs both. Reference analog: the engine's web loader keeps
per-document metadata next to the body; RDFa is that metadata when
the publisher chose W3C attribute markup.

Same one-parse satellite shape as microdatax: this module is the
correctness oracle; the Spark operator
(``operators/pagemeta.py:extract_rdfa_df``) calls the same functions
from a mapInPandas batch, so golden-parquet parity is structural.

Output: one flat row stream per page, ``(item_idx, parent_idx,
typeof, vocab, resource, prop_idx, prop, value, kind)``:

- a ``typeof`` element emits a DECLARATION row — ``kind='item'``,
  ``prop_idx=-1`` — carrying the FIRST ``typeof`` token (raw, CURIE
  prefixes preserved), the in-scope ``vocab`` (nearest own-or-
  ancestor ``vocab`` attribute, trimmed), and ``resource`` (the
  element's ``about`` else ``resource`` attribute, resolved against
  ``base_url``); ``parent_idx`` is the enclosing item when the
  element ALSO has ``property`` (it is then a nested-item value),
  else null;
- a nested item additionally emits on the PARENT one REF row per
  ``property`` token — ``kind='ref'``, ``value=str(child_idx)``;
- a plain ``property`` element inside an item emits one row per
  token: a ``content`` attribute wins on ANY tag (the RDFa rule,
  unlike microdata's meta-only), then a/area/link→href and
  img/audio/video/iframe/embed/source/track→src (``kind='url'``,
  resolved), object→data, data/meter→value, time→datetime, else the
  whitespace-normalized subtree text (entities preserved).

Determinism contract mirrors microdatax: document-order items,
per-item ``prop_idx`` counter (``(item_idx, prop_idx)`` unique per
page), duplicate tokens within one attribute dropped, child
declaration immediately before the parent's ref rows, ``property``
outside any open item ignored (document-level vocab-only statements
are out of scope, as are full CURIE prefix maps — extruct-style
resolution is a downstream swap behind the same schema), malformed
pages degrade to fewer rows, never raise (F5).
"""
from __future__ import annotations

from urllib.parse import urljoin

from .htmlx import decode_payload, iter_elements, parse_dom, subtree_text

_URL_ATTRS = {"audio": "src", "embed": "src", "iframe": "src",
              "img": "src", "source": "src", "track": "src",
              "video": "src", "a": "href", "area": "href",
              "link": "href", "object": "data"}
_VAL_ATTRS = {"data": "value", "meter": "value"}


def _tokens(attr_value: str | None) -> list[str]:
    seen: set[str] = set()
    out: list[str] = []
    for tok in (attr_value or "").split():
        if tok not in seen:
            seen.add(tok)
            out.append(tok)
    return out


def _prop_value(el, src: str, base_url: str | None
                ) -> tuple[str | None, str]:
    """(value, kind) for a non-typeof property element."""
    content = el.attrs.get("content")
    if content is not None:             # content wins on ANY tag
        return content, "attr"
    tag = el.tag
    if tag in _URL_ATTRS:
        raw = el.attrs.get(_URL_ATTRS[tag])
        if raw is not None and base_url:
            raw = urljoin(base_url, raw)
        return raw, "url"
    if tag in _VAL_ATTRS:
        return el.attrs.get(_VAL_ATTRS[tag]), "attr"
    if tag == "time":
        dt = el.attrs.get("datetime")
        if dt is not None:
            return dt, "attr"
    return subtree_text(el, src), "text"


def extract_rdfa(payload, base_url: str | None = None) -> list[tuple]:
    """Flat RDFa rows ``(item_idx, parent_idx, typeof, vocab,
    resource, prop_idx, prop, value, kind)`` for a page (see module
    contract)."""
    if isinstance(payload, (bytes, bytearray, memoryview)):
        src = decode_payload(bytes(payload))
    else:
        src = payload or ""
    return rdfa_from_root(parse_dom(src, full_attrs=True), src, base_url)


def rdfa_from_root(root, src: str, base_url: str | None = None
                   ) -> list[tuple]:
    """extract_rdfa over an already-parsed tree (the one-parse
    page_artifacts path shares the DOM across artifact families)."""
    rows: list[tuple] = []
    n_items = 0
    next_prop: list[int] = []
    open_items: list[tuple[int, int]] = []      # (depth, item_idx)
    vocab_stack: list[tuple[int, str]] = []     # (depth, vocab)

    def emit_prop(item: int, prop: str, value, kind: str) -> None:
        rows.append((item, None, None, None, None,
                     next_prop[item], prop, value, kind))
        next_prop[item] += 1

    for el, depth in iter_elements(root):
        while open_items and open_items[-1][0] >= depth:
            open_items.pop()
        while vocab_stack and vocab_stack[-1][0] >= depth:
            vocab_stack.pop()
        attrs = el.attrs
        if "vocab" in attrs:
            vocab_stack.append((depth, (attrs.get("vocab") or "").strip()))
        if "property" not in attrs and "typeof" not in attrs:
            continue
        enclosing = open_items[-1][1] if open_items else None
        props = _tokens(attrs.get("property"))
        if "typeof" in attrs:
            idx = n_items
            n_items += 1
            next_prop.append(0)
            is_nested = enclosing is not None and bool(props)
            typeof = _tokens(attrs.get("typeof")) or [None]
            vocab = vocab_stack[-1][1] if vocab_stack else None
            resource = attrs.get("about")
            if resource is None:
                resource = attrs.get("resource")
            if resource is not None and base_url:
                resource = urljoin(base_url, resource)
            rows.append((idx, enclosing if is_nested else None,
                         typeof[0], vocab or None, resource,
                         -1, None, None, "item"))
            if is_nested:
                for prop in props:
                    emit_prop(enclosing, prop, str(idx), "ref")
            open_items.append((depth, idx))
        elif props and enclosing is not None:
            value, kind = _prop_value(el, src, base_url)
            for prop in props:
                emit_prop(enclosing, prop, value, kind)
    return rows
