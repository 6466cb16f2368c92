"""Form extraction — interactive-page profiling (Spark-free, pure
Python).

Forms are the cheapest page-function signal a quality pipeline gets:
a page whose dominant artifact is a password form is a login wall,
not prose; a signup/checkout form farm is template chrome; a search
box is site furniture. C4-style corpora gate these OUT before any
text scoring spends cycles on them. This satellite surfaces one row
per ``<form>`` with its control census so the gates downstream are
pure integer SQL.

Built on the fast scanner's full-attribute mode and wired into the
one-parse ``pagex`` pass (``forms_from_root``). This module is the
correctness oracle: the Spark operator
(``operators/pagemeta.py:extract_forms_df``) calls these functions
from a mapInPandas batch, so golden-parquet parity is structural.

Determinism contract:
- one row per ``<form>`` element in document order; ``pos`` dense
  from 0. Controls under a NESTED ``<form>`` belong to the inner
  form only (the don't-descend rule; HTML forbids nesting but soup
  exists);
- ``action_url``: the ``action`` attribute stripped and resolved
  against the page URL; None when absent/empty (the spec's
  submit-to-self default is the READER's business — absence is
  information);
- ``method``: lowercased ``method`` attribute; absent/empty/unknown
  values fall back to 'get' (the spec default — only 'post' and
  'dialog' are recognized alternatives);
- control census over ``<input>``/``<textarea>``/``<select>``/
  ``<button>`` descendants: ``n_controls`` counts input+textarea+
  select (buttons are not data controls); per-kind counts key on the
  lowercased input ``type``: ``n_password``, ``n_email``,
  ``n_hidden``, ``n_file``, ``n_text`` (type text + textarea +
  ABSENT/empty type, the spec default), ``n_submit``
  (input[type=submit] + button whose type is 'submit' OR ABSENT —
  the button spec default); other types (checkbox, radio, ...)
  count only in ``n_controls``;
- ``has_search``: any control with ``type="search"`` OR a
  lowercased ``name`` in {'q', 's', 'search', 'query'} — the
  conventional search-box names;
- malformed pages degrade to fewer rows, never raise (F5).
"""
from __future__ import annotations

from urllib.parse import urljoin

from .htmlx import _Node, decode_payload, iter_elements, parse_dom

_SEARCH_NAMES = ("q", "s", "search", "query")
_CONTROL_TAGS = ("input", "textarea", "select", "button")


def forms_from_root(root: _Node, src: str,
                    base_url: str | None = None) -> list[tuple]:
    """(pos, action_url, method, n_controls, n_password, n_email,
    n_hidden, n_file, n_text, n_submit, has_search) per <form> in
    document order."""
    out: list[tuple] = []
    for el, _depth in iter_elements(root):
        if el.tag != "form":
            continue
        action = (el.attrs.get("action") or "").strip()
        action_url = (urljoin(base_url, action) if base_url
                      else action) if action else None
        method = (el.attrs.get("method") or "").strip().lower()
        if method not in ("post", "dialog"):
            method = "get"
        counts = {"password": 0, "email": 0, "hidden": 0, "file": 0,
                  "text": 0, "submit": 0}
        n_controls = 0
        has_search = False
        for sub, _d in iter_elements(el, descend=lambda e:
                                     e.tag != "form"):
            if sub.tag not in _CONTROL_TAGS:
                continue
            typ = (sub.attrs.get("type") or "").strip().lower()
            if sub.tag == "button":
                if typ in ("submit", ""):
                    counts["submit"] += 1
                continue
            n_controls += 1
            if sub.tag == "textarea":
                counts["text"] += 1
            elif sub.tag == "input":
                if typ in counts:
                    counts[typ] += 1
                elif typ == "":
                    counts["text"] += 1
            if typ == "search" or (sub.attrs.get("name") or "") \
                    .strip().lower() in _SEARCH_NAMES:
                has_search = True
        out.append((len(out), action_url, method, n_controls,
                    counts["password"], counts["email"],
                    counts["hidden"], counts["file"], counts["text"],
                    counts["submit"], has_search))
    return out


def extract_forms(payload, base_url: str | None = None) -> list[tuple]:
    """One row per <form> in the document (bytes payloads decoded via
    the shared charset sniff) — see the module contract."""
    if isinstance(payload, (bytes, bytearray, memoryview)):
        src = decode_payload(bytes(payload))
    else:
        src = payload or ""
    return forms_from_root(parse_dom(src, full_attrs=True), src,
                           base_url)
