"""schema.org microdata extraction (Spark-free, pure Python).

Microdata (``itemscope``/``itemtype``/``itemprop`` attributes) is the
third structured-data syntax alongside meta tags (metax) and JSON-LD
(jsonldx) — older CMSes and product pages annotate the visible DOM
itself instead of embedding a JSON block. An extruct-style pass over
it yields the same aligned (text, structure) training pairs the
JSON-LD pass mines. Reference analog: the engine's web loader keeps
per-document metadata next to the body (web docs enter via
web_RAG_methods.py); microdata is that metadata when the publisher
chose attribute markup.

Built on the fast scanner's full-attribute mode like metax/jsonldx;
this module is the correctness oracle — the Spark operator
(``operators/pagemeta.py:extract_microdata_df``) calls the same
functions from a mapInPandas batch, so golden-parquet parity is
structural.

Output: ONE flat row stream per page, normalized in one table.
Each row is ``(item_idx, parent_idx, itemtype, itemid, prop_idx,
prop, value, kind)``:

- an ``itemscope`` element emits a DECLARATION row — ``kind='item'``,
  ``prop_idx=-1``, ``prop``/``value`` null — carrying ``itemtype``
  (first whitespace token, others dropped) and ``itemid``;
  ``parent_idx`` is the enclosing item when the element ALSO has
  ``itemprop`` (it is then a nested-item property), else null (a
  stray itemscope inside an item without itemprop is a new top-level
  item, per spec);
- a nested item additionally emits on the PARENT one REF row per
  ``itemprop`` token — ``kind='ref'``, ``value=str(child_item_idx)``;
- a plain ``itemprop`` element inside an item emits one row per token
  with the value by the HTML spec's tag rules: meta→content,
  img/audio/video/source/track/embed/iframe→src, a/area/link→href,
  object→data, data/meter→value, time→datetime-else-text, otherwise
  the whitespace-normalized subtree text (entities preserved — the
  linkx/subtree_text byte-slice contract). ``kind`` is ``'url'`` for
  the URL-valued tags (resolved against ``base_url`` when given),
  ``'attr'`` for other attribute values, ``'text'`` for text content.

Determinism contract:
- items number in document (preorder) order; ``prop_idx`` is a
  per-item counter over its prop/ref rows, so ``(item_idx,
  prop_idx)`` is a unique sort key per page;
- rows stream in emission order: declaration at the opening element,
  a nested child's declaration immediately before its parent's ref
  rows;
- duplicate tokens within one ``itemprop`` attribute are dropped
  (the spec calls the attribute an unordered unique-token set);
- ``itemprop`` outside any open item is ignored; descendants of a
  nested item belong to the NESTED item, never the outer one;
- ``itemref`` is out of scope (vanishingly rare in crawl data; a
  production swap is documented in operators/pagemeta.py);
- malformed pages degrade to fewer rows, never raise (F5 contract).
"""
from __future__ import annotations

from urllib.parse import urljoin

from .htmlx import decode_payload, iter_elements, parse_dom, subtree_text

# tag -> (attr, kind) per the HTML microdata value rules
_URL_ATTRS = {"audio": "src", "embed": "src", "iframe": "src",
              "img": "src", "source": "src", "track": "src",
              "video": "src", "a": "href", "area": "href",
              "link": "href", "object": "data"}
_VAL_ATTRS = {"meta": "content", "data": "value", "meter": "value"}


def _tokens(attr_value: str | None) -> list[str]:
    """Unique itemprop tokens in source order (spec: unordered set)."""
    seen: set[str] = set()
    out: list[str] = []
    for tok in (attr_value or "").split():
        if tok not in seen:
            seen.add(tok)
            out.append(tok)
    return out


def _prop_value(el, src: str, base_url: str | None
                ) -> tuple[str | None, str]:
    """(value, kind) for a non-itemscope itemprop element."""
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


def extract_microdata(payload, base_url: str | None = None
                      ) -> list[tuple]:
    """Flat microdata rows ``(item_idx, parent_idx, itemtype, itemid,
    prop_idx, prop, value, kind)`` for a page (see module contract)."""
    if isinstance(payload, (bytes, bytearray, memoryview)):
        src = decode_payload(bytes(payload))
    else:
        src = payload or ""
    return microdata_from_root(parse_dom(src, full_attrs=True),
                               src, base_url)


def microdata_from_root(root, src: str, base_url: str | None = None
                        ) -> list[tuple]:
    """extract_microdata over an already-parsed tree (the one-parse
    page_artifacts path shares the DOM across artifact families)."""
    rows: list[tuple] = []
    n_items = 0
    next_prop: list[int] = []        # per-item prop_idx counters
    # stack of (depth, item_idx): the innermost enclosing open item
    open_items: list[tuple[int, int]] = []

    def emit_prop(item: int, prop: str, value, kind: str) -> None:
        rows.append((item, None, None, None,
                     next_prop[item], prop, value, kind))
        next_prop[item] += 1

    for el, depth in iter_elements(root):
        while open_items and open_items[-1][0] >= depth:
            open_items.pop()
        attrs = el.attrs
        if "itemprop" not in attrs and "itemscope" not in attrs:
            continue
        enclosing = open_items[-1][1] if open_items else None
        props = _tokens(attrs.get("itemprop"))
        if "itemscope" in attrs:
            idx = n_items
            n_items += 1
            next_prop.append(0)
            is_nested = enclosing is not None and bool(props)
            itemtype = (attrs.get("itemtype") or "").split() or [None]
            itemid = attrs.get("itemid")
            if itemid is not None and base_url:
                itemid = urljoin(base_url, itemid)
            rows.append((idx, enclosing if is_nested else None,
                         itemtype[0], itemid, -1, None, None, "item"))
            if is_nested:
                for prop in props:
                    emit_prop(enclosing, prop, str(idx), "ref")
            open_items.append((depth, idx))
        elif props and enclosing is not None:
            value, kind = _prop_value(el, src, base_url)
            for prop in props:
                emit_prop(enclosing, prop, value, kind)
    return rows
