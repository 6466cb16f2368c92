"""Image/figure extraction — CLIP-style image-text pair mining
(Spark-free, pure Python).

Image-text pairs are the core multimodal training asset a web corpus
yields: every ``<img>`` with usable nearby text (alt, figcaption,
title) is a candidate (image_url, caption) pair for contrastive
pretraining (the LAION recipe). The reference's multimodal stage
consumes images alongside text (``utils/multimodal_RAG_methods.py``);
this is the corpus-level pass that surfaces one row per image with
every text candidate attached so downstream SQL picks pairs.

Built on the fast scanner's full-attribute mode like linkx/codex and
wired into the one-parse ``pagex`` pass (``images_from_root``). This
module is the correctness oracle: the Spark operator
(``operators/pagemeta.py:extract_images_df``) calls these functions
from a mapInPandas batch, so golden-parquet parity is structural.

Determinism contract:
- one row per ``<img>`` element in document order; ``pos`` is dense
  from 0. Script/style bodies are CDATA to the scanner, so markup in
  them never yields images;
- ``src`` is the ``src`` attribute, or the ``data-src`` lazy-load
  fallback when ``src`` is absent/empty, stripped and resolved
  against the page URL (same urljoin as linkx); None when both are
  missing/empty. ``srcset`` is intentionally not consulted — its
  first candidate duplicates ``src`` on real pages;
- ``alt``/``title`` are the attribute values (already entity-decoded
  by the full-attrs scanner), whitespace-collapsed; an ABSENT
  attribute is None while an empty/blank one is '' — the decorative
  marker ``alt=""`` must stay distinguishable from a missing alt;
- ``width``/``height`` follow the HTML dimension-attribute rule:
  leading digits after stripping whitespace ('100px' -> 100), > 0,
  else None;
- ``caption`` is the whitespace-normalized subtree text of the FIRST
  ``<figcaption>`` (document order) inside the NEAREST ``<figure>``
  ancestor, entities preserved (the linkx anchor-text byte-slice
  contract); the search does not descend into NESTED ``<figure>``
  subtrees (their captions belong to their own images — the tablex
  don't-descend rule); None when there is no figure ancestor or it
  has no figcaption, '' when the figcaption is empty;
- ``in_link`` marks images wrapped in an ``<a>`` ancestor (linked
  thumbnails rank below content images in pair quality);
- malformed pages degrade to fewer rows, never raise (F5).
"""
from __future__ import annotations

import re
from urllib.parse import urljoin

from .htmlx import _Node, decode_payload, iter_elements, parse_dom, \
    subtree_text

_DIM_RE = re.compile(r"^\s*(\d+)")


def _dim(val: str | None) -> int | None:
    """HTML dimension-attribute parse: leading digits, positive."""
    if not val:
        return None
    m = _DIM_RE.match(val)
    if not m:
        return None
    n = int(m.group(1))
    return n if 0 < n <= 0x7FFFFFFF else None


def _collapse(val: str | None) -> str | None:
    """Whitespace-collapse an attribute value; absent stays None,
    present-but-blank becomes '' (the decorative-alt distinction)."""
    if val is None:
        return None
    return " ".join(val.split())


def _figure_caption(el: _Node, src: str) -> str | None:
    """Text of the first <figcaption> inside el's nearest <figure>
    ancestor (None when no figure ancestor / no figcaption)."""
    anc = el.parent
    while anc is not None and anc.tag != "figure":
        anc = anc.parent
    if anc is None:
        return None
    for cand, _d in iter_elements(anc, descend=lambda e:
                                  e.tag != "figure"):
        if cand.tag == "figcaption":
            return subtree_text(cand, src)
    return None


def images_from_root(root: _Node, src: str,
                     base_url: str | None = None) -> list[tuple]:
    """(pos, src_url, alt, title, width, height, caption, in_link)
    per <img> element in document order."""
    out: list[tuple] = []
    for el, _depth in iter_elements(root):
        if el.tag != "img":
            continue
        raw = (el.attrs.get("src") or "").strip() \
            or (el.attrs.get("data-src") or "").strip()
        target = (urljoin(base_url, raw) if base_url else raw) \
            if raw else None
        out.append((len(out), target,
                    _collapse(el.attrs.get("alt")),
                    _collapse(el.attrs.get("title")),
                    _dim(el.attrs.get("width")),
                    _dim(el.attrs.get("height")),
                    _figure_caption(el, src),
                    el.in_link))
    return out


def extract_images(payload, base_url: str | None = None) -> list[tuple]:
    """(pos, src_url, alt, title, width, height, caption, in_link)
    for every <img> in the document (bytes payloads decoded via the
    shared charset sniff)."""
    if isinstance(payload, (bytes, bytearray, memoryview)):
        src = decode_payload(bytes(payload))
    else:
        src = payload or ""
    return images_from_root(parse_dom(src, full_attrs=True), src,
                            base_url)


# --- srcset microsyntax (HTML spec: image candidate strings) -----------------
# The responsive-image fetch planner needs candidates, not the raw
# attribute: each candidate is a URL plus a width (`640w`) or
# density (`2x`, `1.5x`) descriptor. Deterministic subset of the
# spec algorithm, float-free (densities are exact milli-units):
# - candidates split on whitespace/comma runs; a URL's TRAILING
#   commas terminate its candidate (the spec's comma rule — a URL
#   containing commas mid-string survives);
# - descriptor `Nw` -> ('w', N); `N(.F)x` -> ('x', N*1000 + frac
#   scaled to milli, exact); missing descriptor -> ('x', 1000);
#   any other descriptor drops the candidate (spec parse error);
# - values clamp to [0, 2^31) (attribute-fed-allocation rule);
#   zero-width candidates drop (spec requires positive).

_SRCSET_W_RE = re.compile(r"^([0-9]+)w$")
_SRCSET_X_RE = re.compile(r"^([0-9]+)(?:\.([0-9]+))?x$")
_SRCSET_CLAMP = (1 << 31) - 1


def parse_srcset(value) -> list[tuple[int, str, str, int]]:
    """srcset attribute value -> [(pos, url, kind 'w'|'x', val)]
    where val is the width in pixels or the density in exact
    milli-x. None/empty/whitespace yield no rows, never raise."""
    out: list[tuple[int, str, str, int]] = []
    s = value or ""
    i, n = 0, len(s)
    while i < n:
        while i < n and s[i] in " \t\n\r\f,":
            i += 1
        if i >= n:
            break
        start = i
        while i < n and s[i] not in " \t\n\r\f":
            i += 1
        url = s[start:i]
        terminated = url.endswith(",")
        url = url.rstrip(",")
        if not url:
            continue
        desc = ""
        if not terminated:
            while i < n and s[i] in " \t\n\r\f":
                i += 1
            start = i
            while i < n and s[i] != ",":
                i += 1
            desc = s[start:i].strip(" \t\n\r\f")
            i += 1               # past the comma
        if not desc:
            out.append((len(out), url, "x", 1000))
            continue
        m = _SRCSET_W_RE.match(desc)
        if m:
            w = min(int(m.group(1)), _SRCSET_CLAMP)
            if w > 0:
                out.append((len(out), url, "w", w))
            continue
        m = _SRCSET_X_RE.match(desc)
        if m:
            whole, frac = m.groups()
            val = int(whole) * 1000 + int(((frac or "") + "000")[:3])
            if 0 < val <= _SRCSET_CLAMP:
                out.append((len(out), url, "x", val))
    return out
