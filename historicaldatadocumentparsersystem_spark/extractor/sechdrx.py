"""Security response-header parsing (HSTS / CSP / Referrer-Policy /
X-Frame-Options) — pure Python, stdlib only.

Security posture is a host-quality signal for a web corpus: an
operated, maintained site ships HSTS and a real CSP; `unsafe-inline`
everywhere and no frame policy is the abandoned-site shape. This
module is the shared grammar for all engines (the cachex pattern):
regexes and token tables below are GENERATED into the DuckDB twin —
keep them RE2-safe (no lookaround, no backreferences).

Deterministic subset:
- HSTS (RFC 6797 §6.1): directives split on ``;``; empty segments
  skipped; names lowercase + OWS-trimmed (an ``=`` with an empty
  name invalidates the header); values OWS-trimmed with ONE layer of
  DQUOTEs removed (escape-free quoted-string); a DUPLICATE directive
  name invalidates the header (MUST NOT appear twice); ``max-age``
  is required and trusted only as 1-15 digits. An invalid header
  reports ``valid=False`` with neutral fields (the UA ignores it).
- CSP: directives split on ``;``; each segment splits on runs of
  SP/HTAB; the first token (lowercased) is the directive name, the
  rest are source expressions kept raw; duplicate directive names
  keep the FIRST occurrence (later ones are ignored per spec);
  ``pos`` is the segment index before dedup.
- Referrer-Policy: comma-separated tokens, lowercased + trimmed;
  the LAST recognized policy wins (spec fallback order).
- X-Frame-Options: case-insensitive DENY / SAMEORIGIN; an
  ``ALLOW-FROM ...`` prefix reports ``allow-from`` (obsolete);
  anything else is ``invalid``; absent stays None.
"""

from __future__ import annotations

import re

OWS = " \t"
HSTS_MAXAGE_RE = r"^[0-9]{1,15}$"
WSP_RE = r"[ \t]+"

REFERRER_POLICIES = (
    "no-referrer", "no-referrer-when-downgrade", "origin",
    "origin-when-cross-origin", "same-origin", "strict-origin",
    "strict-origin-when-cross-origin", "unsafe-url")
# policies that never leak the path cross-origin
STRICT_REFERRER = ("no-referrer", "same-origin", "strict-origin",
                   "strict-origin-when-cross-origin")

_MAXAGE = re.compile(HSTS_MAXAGE_RE)
_WSP = re.compile(WSP_RE)


def _dequote(v: str) -> str:
    if len(v) >= 2 and v.startswith('"') and v.endswith('"'):
        return v[1:-1]
    return v


def parse_hsts(value) -> dict | None:
    """Strict-Transport-Security value -> {valid, max_age,
    include_subdomains, preload}; None when absent. Invalid headers
    (duplicate directive, empty name, missing/untrusted max-age)
    come back valid=False with neutral fields."""
    if not value:
        return None
    seen: dict[str, str | None] = {}
    valid = True
    for seg in value.split(";"):
        if seg.strip(OWS) == "":
            continue
        e = seg.find("=")
        if e < 0:
            k, v = seg.strip(OWS).lower(), None
        else:
            k = seg[:e].strip(OWS).lower()
            v = _dequote(seg[e + 1:].strip(OWS))
        if not k or k in seen:
            valid = False
            break
        seen[k] = v
    ma = seen.get("max-age")
    if ma is None or not _MAXAGE.match(ma):
        valid = False
    if not valid:
        return {"valid": False, "max_age": None,
                "include_subdomains": False, "preload": False}
    return {"valid": True, "max_age": int(ma),
            "include_subdomains": "includesubdomains" in seen,
            "preload": "preload" in seen}


def parse_csp(value) -> list[tuple[int, str, list[str]]]:
    """Content-Security-Policy value -> [(pos, directive_lower,
    [source, ...])]. First occurrence of a directive wins; pos is
    the pre-dedup segment index; empty segments drop."""
    out: list[tuple[int, str, list[str]]] = []
    if not value:
        return out
    seen: set[str] = set()
    pos = 0
    for seg in value.split(";"):
        seg = seg.strip(OWS)
        if not seg:
            continue
        toks = _WSP.split(seg)
        name = toks[0].lower()
        if name not in seen:
            seen.add(name)
            out.append((pos, name, toks[1:]))
        pos += 1
    return out


def parse_referrer_policy(value) -> str | None:
    """Referrer-Policy value -> the LAST recognized policy token
    (comma-separated fallback list), or None."""
    if not value:
        return None
    got = None
    for tok in value.split(","):
        t = tok.strip(OWS).lower()
        if t in REFERRER_POLICIES:
            got = t
    return got


def parse_xfo(value) -> str | None:
    """X-Frame-Options value -> deny | sameorigin | allow-from |
    invalid; None when absent."""
    if not value:
        return None
    t = value.strip(OWS).lower()
    if t in ("deny", "sameorigin"):
        return t
    if t.startswith("allow-from"):
        return "allow-from"
    return "invalid"
