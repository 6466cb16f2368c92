"""Content-license detection (CC link / SPDX tag / phrase
heuristics) — pure Python, stdlib only.

License filtering is a first-class training-data gate: corpora keep
CC-BY/CC0 pages, drop ND/NC variants or all-rights-reserved pages.
Three independent signal channels, resolved by precedence:

- ``link``: a Creative Commons license URL (``CC_HREF_RE``) maps to
  a canonical SPDX-style id (``CC-BY-SA-4.0``); the public-domain
  dedication (``CC0_HREF_RE``) maps to ``CC0-1.0``;
- ``spdx``: an ``SPDX-License-Identifier: <id>`` tag in text
  (``SPDX_RE``), id kept verbatim;
- ``phrase``: lowercase-contains over the ``PHRASES`` table
  (license boilerplate + the all-rights-reserved counter-signal).

Every regex/constant is GENERATED into the DuckDB twin and used
verbatim by the Spark built-ins (the soft404/_W_SQL precedent) —
keep them RE2-safe and lowercase-comparable. Precedence when
resolving one license per page: link > spdx > phrase; ties within a
channel break lexicographically (deterministic in every engine).
"""

from __future__ import annotations

import re

# group 1 = variant (by, by-sa, ...), group 2 = version
CC_HREF_RE = (r"creativecommons\.org/licenses/"
              r"([a-z][a-z-]*)/([0-9]+\.[0-9]+)")
CC0_HREF_RE = r"creativecommons\.org/publicdomain/zero/1\.0"
SPDX_RE = r"SPDX-License-Identifier:[ \t]*([0-9A-Za-z.+-]+)"

# (needle lowercase, license id) — first match per needle emits one
# phrase signal; ARR is the all-rights-reserved counter-signal
PHRASES = (
    ("mit license", "MIT"),
    ("apache license, version 2.0", "Apache-2.0"),
    ("gnu general public license", "GPL"),
    ("mozilla public license", "MPL"),
    ("all rights reserved", "ARR"),
)

# channel precedence for resolve (lower = stronger)
SOURCE_RANK = {"link": 0, "spdx": 1, "phrase": 2}

_CC = re.compile(CC_HREF_RE)
_CC0 = re.compile(CC0_HREF_RE)
_SPDX = re.compile(SPDX_RE)


def link_license(href) -> str | None:
    """License URL -> canonical id (CC-<VARIANT>-<ver> / CC0-1.0)
    or None."""
    if not href:
        return None
    m = _CC.search(href)
    if m:
        return f"CC-{m.group(1).upper()}-{m.group(2)}"
    if _CC0.search(href):
        return "CC0-1.0"
    return None


def text_signals(text) -> list[tuple[str, str]]:
    """Page text -> [(source, license_id)] from the spdx and phrase
    channels (first SPDX tag only; each phrase at most once)."""
    out: list[tuple[str, str]] = []
    if not text:
        return out
    m = _SPDX.search(text)
    if m:
        out.append(("spdx", m.group(1)))
    low = text.lower()
    for needle, lic in PHRASES:
        if needle in low:
            out.append(("phrase", lic))
    return out


def resolve(signals: list[tuple[str, str]]) -> tuple[str, str] | None:
    """[(source, license_id)] -> the winning (source, license_id)
    by channel precedence then lexicographic id, or None."""
    if not signals:
        return None
    return min(signals,
               key=lambda s: (SOURCE_RANK.get(s[0], 9), s[1]))
