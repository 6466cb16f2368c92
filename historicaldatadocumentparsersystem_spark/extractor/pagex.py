"""One-parse page-artifact extraction (Spark-free, pure Python).

At 100 TB the DOM parse dominates the satellite passes: a pipeline
that wants links AND metadata AND tables AND JSON-LD AND a layout
skeleton must not decode + parse the same payload five times. This
module decodes and parses ONCE and hands the shared tree to each
family's ``*_from_root`` function — the outputs are definitionally
identical to the individual extractors (pinned by the equivalence
pytest in tests/test_pagemeta.py), so every family keeps its own
golden while the combined pass pays one parse.

The Spark operator (``operators/pagemeta.py:page_artifacts``) emits
one row per page with array<struct> columns per family; downstream
explodes only the families it consumes.
"""
from __future__ import annotations

from .avx import av_from_root
from .codex import code_from_root
from .datex import dates_from_root
from .figx import images_from_root
from .formx import forms_from_root
from .htmlx import decode_payload, parse_dom
from .jsonldx import jsonld_from_root
from .linkx import links_from_root
from .metax import hreflang_from_root, meta_from_root
from .mf2x import mf2_from_root
from .microdatax import microdata_from_root
from .outlinex import outline_from_root
from .rdfax import rdfa_from_root
from .shapex import skeleton_from_root
from .tablex import tables_from_root


def extract_page_artifacts(payload, base_url: str | None = None,
                           max_tags: int = 500) -> dict:
    """All artifact families from ONE decode + ONE DOM parse:
    {meta, hreflang, links, cells, jsonld, microdata, rdfa, mf2,
    dates, code, outline, images, av, forms, skeleton, n_tags,
    max_depth, truncated}."""
    if isinstance(payload, (bytes, bytearray, memoryview)):
        src = decode_payload(bytes(payload))
    else:
        src = payload or ""
    root = parse_dom(src, full_attrs=True)
    skeleton, n_tags, max_depth, truncated = skeleton_from_root(
        root, max_tags)
    return {
        "meta": meta_from_root(root, src, base_url),
        "hreflang": hreflang_from_root(root, base_url),
        "links": links_from_root(root, src, base_url),
        "cells": tables_from_root(root, src),
        "jsonld": jsonld_from_root(root, src),
        "microdata": microdata_from_root(root, src, base_url),
        "rdfa": rdfa_from_root(root, src, base_url),
        "mf2": mf2_from_root(root, src, base_url),
        "dates": dates_from_root(root, src, base_url),
        "code": code_from_root(root, src),
        "outline": outline_from_root(root, src),
        "images": images_from_root(root, src, base_url),
        "av": av_from_root(root, src, base_url),
        "forms": forms_from_root(root, src, base_url),
        "skeleton": skeleton,
        "n_tags": n_tags,
        "max_depth": max_depth,
        "truncated": truncated,
    }
