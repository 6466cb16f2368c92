"""Web App Manifest reader (W3C appmanifest) — pure Python, stdlib
json, Spark-free.

``<link rel="manifest">`` points at a site's PWA manifest — an
identity record (name, start_url, scope, icons) that complements
the metax/microdata page-level identity satellites at the SITE
level. Deterministic subset:

- string members taken verbatim when strings (name, short_name,
  start_url, scope, lang, theme_color, background_color);
- ``display`` gated to the spec enum (fullscreen / standalone /
  minimal-ui / browser) — anything else is None (spec says ignore
  invalid values, falling back to the default chain);
- icons: one row per array entry with a string ``src``; sizes /
  type / purpose kept verbatim when strings;
- anything that is not a JSON object yields None — never raises.
"""

from __future__ import annotations

import json

DISPLAY_MODES = ("fullscreen", "standalone", "minimal-ui",
                 "browser")


def _s(v):
    return v if isinstance(v, str) else None


def parse_manifest(payload) -> dict | None:
    if payload is None:
        return None
    if isinstance(payload, (bytes, bytearray)):
        try:
            payload = bytes(payload).decode("utf-8")
        except UnicodeDecodeError:
            return None
    try:
        doc = json.loads(payload)
    except Exception:
        return None
    if not isinstance(doc, dict):
        return None
    display = _s(doc.get("display"))
    if display is not None:
        display = display.strip().lower()
        if display not in DISPLAY_MODES:
            display = None
    icons = []
    raw_icons = doc.get("icons")
    if isinstance(raw_icons, list):
        for ic in raw_icons:
            if not isinstance(ic, dict):
                continue
            src = _s(ic.get("src"))
            if not src:
                continue
            icons.append((len(icons), src, _s(ic.get("sizes")),
                          _s(ic.get("type")),
                          _s(ic.get("purpose"))))
    return {
        "name": _s(doc.get("name")),
        "short_name": _s(doc.get("short_name")),
        "start_url": _s(doc.get("start_url")),
        "scope": _s(doc.get("scope")),
        "display": display,
        "theme_color": _s(doc.get("theme_color")),
        "background_color": _s(doc.get("background_color")),
        "lang": _s(doc.get("lang")),
        "icons": icons,
    }


def build_manifest(**members) -> bytes:
    """Encode half for fixtures (sorted keys, must round-trip)."""
    return json.dumps(members, sort_keys=True,
                      ensure_ascii=False).encode("utf-8")
