"""Audio/video/embed element mining — video-text pair discovery
(Spark-free, pure Python).

The video-side analog of figx: every ``<video>``, ``<audio>`` and
``<iframe>`` is a candidate multimodal training asset. A ``<video>``
with a figcaption is a (video_url, caption) contrastive pair; a
``<track kind=subtitles>`` is the transcript handle that feeds
frame-cue alignment; an ``<iframe>`` pointing at a known player is a
third-party embed whose provider/id a pipeline resolves for fetching.
The reference consumes media alongside text in its multimodal stage
(``utils/multimodal_RAG_methods.py``); this is the corpus pass that
surfaces the assets.

Built on the fast scanner's full-attribute mode and wired into the
one-parse ``pagex`` pass (``av_from_root``). This module is the
correctness oracle: the Spark operator
(``operators/pagemeta.py:extract_av_df``) calls these functions from
a mapInPandas batch, so golden-parquet parity is structural.

Determinism contract:
- one row per ``<video>``/``<audio>``/``<iframe>`` element in
  document order; ``pos`` is dense from 0 across all three kinds;
  ``kind`` is the tag name. Nested media elements each get their own
  row, but a ``<source>``/``<track>`` under a NESTED media element
  belongs to that inner element only (the tablex don't-descend rule);
- ``src_url``: the element's own ``src`` attribute, stripped; when
  that is absent/empty on video/audio, the first ``<source>``
  descendant with a non-empty ``src`` supplies it. Resolved against
  the page URL (same urljoin as linkx/figx); None when nothing
  usable. ``src_type`` is the supplying ``<source>``'s ``type``
  attribute lowercased (None when src came from the element itself
  or is absent — only ``<source>`` carries a type);
- ``n_sources`` counts ``<source>`` descendants (0 for iframe);
- ``poster_url``: ``<video poster>`` resolved; None otherwise;
- ``title`` is the title attribute, whitespace-collapsed; absent is
  None while present-but-blank is '' (the figx decorative
  distinction). For iframes the title attribute is the accessibility
  text and the main caption candidate;
- ``width``/``height`` follow the HTML dimension-attribute rule
  (leading digits, positive — shared with figx);
- ``caption`` is the first ``<figcaption>`` of the NEAREST
  ``<figure>`` ancestor, entities preserved, nested figures isolated
  (exactly figx's rule, shared code);
- ``track_url``/``track_lang``: from the first ``<track>`` descendant
  whose ``kind`` attribute (lowercased; ABSENT defaults to
  'subtitles' per the HTML spec) is 'subtitles' or 'captions';
  url resolved, lang = ``srclang`` stripped+lowercased (None when
  absent/empty). Both None when no such track;
- ``in_link`` marks elements wrapped in an ``<a>`` ancestor;
- malformed pages degrade to fewer rows, never raise (F5).
"""
from __future__ import annotations

from urllib.parse import urljoin

from .figx import _collapse, _dim, _figure_caption
from .htmlx import _Node, decode_payload, iter_elements, parse_dom

_AV_TAGS = ("video", "audio", "iframe")
_TRACK_KINDS = ("subtitles", "captions")


def _resolve(raw: str | None, base_url: str | None) -> str | None:
    raw = (raw or "").strip()
    if not raw:
        return None
    return urljoin(base_url, raw) if base_url else raw


def av_from_root(root: _Node, src: str,
                 base_url: str | None = None) -> list[tuple]:
    """(pos, kind, src_url, src_type, poster_url, title, width,
    height, caption, track_url, track_lang, n_sources, in_link) per
    A/V element in document order."""
    out: list[tuple] = []
    for el, _depth in iter_elements(root):
        if el.tag not in _AV_TAGS:
            continue
        own = lambda e: e.tag not in _AV_TAGS
        src_url = _resolve(el.attrs.get("src"), base_url)
        src_type = None
        track_url = track_lang = None
        n_sources = 0
        if el.tag != "iframe":
            for sub, _d in iter_elements(el, descend=own):
                if sub.tag == "source":
                    n_sources += 1
                    if src_url is None:
                        cand = _resolve(sub.attrs.get("src"), base_url)
                        if cand is not None:
                            src_url = cand
                            t = (sub.attrs.get("type") or "").strip()
                            src_type = t.lower() or None
                elif sub.tag == "track" and track_url is None:
                    tk = (sub.attrs.get("kind") or "subtitles") \
                        .strip().lower()
                    if tk not in _TRACK_KINDS:
                        continue
                    cand = _resolve(sub.attrs.get("src"), base_url)
                    if cand is None:
                        continue
                    track_url = cand
                    lang = (sub.attrs.get("srclang") or "").strip()
                    track_lang = lang.lower() or None
        poster = _resolve(el.attrs.get("poster"), base_url) \
            if el.tag == "video" else None
        out.append((len(out), el.tag, src_url, src_type, poster,
                    _collapse(el.attrs.get("title")),
                    _dim(el.attrs.get("width")),
                    _dim(el.attrs.get("height")),
                    _figure_caption(el, src),
                    track_url, track_lang, n_sources, el.in_link))
    return out


def extract_av(payload, base_url: str | None = None) -> list[tuple]:
    """One row per <video>/<audio>/<iframe> in the document (bytes
    payloads decoded via the shared charset sniff) — see the module
    contract for the tuple layout."""
    if isinstance(payload, (bytes, bytearray, memoryview)):
        src = decode_payload(bytes(payload))
    else:
        src = payload or ""
    return av_from_root(parse_dom(src, full_attrs=True), src, base_url)
