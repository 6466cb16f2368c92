"""Outlink extraction from HTML pages (Spark-free, pure Python).

A web-scale pipeline needs the link graph as well as the main text:
URL frontier seeding, host-level PageRank-style quality priors
(Common Crawl publishes exactly this artifact), and anchor-text
signals. The reference's loader follows links one page at a time
(its web loader fetches a url and parses the DOM); this is the
corpus-level pass over the same DOM.

Built on the fast scanner's full-attribute mode (node-identical to
the stdlib A/B reference parser) because link extraction needs FULL
attribute dicts
— the fast scanner's ``_attr_dict`` deliberately parses only
class/id for Arc90 classification. Link extraction is a separate
cold-path operator, not part of the flagship extraction stage, so the
~2x parser cost is paid only where hrefs are actually wanted.

Like the extractor, this module is the correctness oracle: the Spark
operator (``operators/linkgraph.py``) calls these functions from a
mapInPandas batch, so golden-parquet parity is structural.
"""
from __future__ import annotations

from urllib.parse import urljoin

from .htmlx import (_Node, decode_payload, iter_elements,
                    parse_dom, subtree_text)

# schemes that are not navigable document links
_SKIP_PREFIXES = ("javascript:", "mailto:", "tel:", "data:")


def _anchor_text(node: _Node, src: str) -> str:
    """Whitespace-normalized text content of an <a> subtree (raw source
    slices, entities preserved — same byte-slice contract as the body
    extractor)."""
    return subtree_text(node, src)


def extract_links(payload, base_url: str | None = None
                  ) -> list[tuple[int, str, str]]:
    """(link_pos, href, anchor) for every navigable <a href> in document
    order. Fragment-only links and non-navigable schemes are skipped;
    relative hrefs resolve against ``base_url`` when given (stdlib
    urljoin, deterministic). Malformed pages degrade to fewer links,
    never raise (the F5 contract).
    """
    if isinstance(payload, (bytes, bytearray, memoryview)):
        src = decode_payload(bytes(payload))
    else:
        src = payload or ""
    return links_from_root(parse_dom(src, full_attrs=True), src, base_url)


def links_from_root(root, src: str, base_url: str | None = None
                    ) -> list[tuple[int, str, str]]:
    """extract_links over an already-parsed tree."""
    out: list[tuple[int, str, str]] = []
    for el, _depth in iter_elements(root):
        if el.tag == "a":
            href = (el.attrs.get("href") or "").strip()
            low = href.lower()
            if (href and not href.startswith("#")
                    and not low.startswith(_SKIP_PREFIXES)):
                target = urljoin(base_url, href) if base_url else href
                out.append((len(out), target, _anchor_text(el, src)))
    return out
