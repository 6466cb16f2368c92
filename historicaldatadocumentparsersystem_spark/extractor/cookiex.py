"""Set-Cookie parsing (RFC 6265 §5.2/§5.3 storage-model subset) —
pure Python, stdlib only.

Cookies are a crawl-side privacy/tracking signal: persistent
long-lived cookies with ``SameSite=None`` are the tracker shape,
``HttpOnly``/``Secure`` coverage is host hygiene, and the
session-vs-persistent split feeds politeness/identity decisions.
This module is the shared grammar for all engines (the cachex
pattern): every regex below is GENERATED into the DuckDB twin, so
keep them RE2-safe (no lookaround, no backreferences).

Deterministic subset (documented divergences from full RFC 6265):
- the name-value pair is everything before the first ``;``; it must
  contain ``=`` with a non-empty trimmed name, else the whole
  header is ignored (§5.2 steps 2-4); the value keeps surrounding
  DQUOTEs (browsers store them);
- attribute segments split on ``;``; names lowercase + OWS-trimmed;
  a segment without ``=`` is a bare flag; the LAST occurrence of an
  attribute wins (§5.2 processes sequentially, later overwrites);
- ``Max-Age`` is trusted only as ``MAXAGE_RE`` (optional sign, 1-15
  digits — int64-safe in every engine) and takes precedence over
  ``Expires`` (§5.3 step 3);
- ``Expires`` accepts STRICT IMF-fixdate only via
  :func:`cachex.httpdate_to_epoch` (full RFC 6265 §5.1.1 tolerant
  date parsing is deliberately out of scope — shared subset);
- ``Domain`` lowercases and strips ONE leading dot (§5.2.3); empty
  normalizes to None (host-only cookie);
- ``Path`` must start with ``/`` else the default path applies
  (None here, §5.2.4); ``SameSite`` keeps its lowercased raw value
  (classification happens downstream).
"""

from __future__ import annotations

import re

from . import cachex

OWS = " \t"
MAXAGE_RE = r"^-?[0-9]{1,15}$"

_MAXAGE = re.compile(MAXAGE_RE)

# attributes surfaced as dedicated columns
ATTRS = ("expires", "max-age", "domain", "path", "samesite")


def parse_set_cookie(value) -> dict | None:
    """One Set-Cookie header value -> storage-model dict (name,
    value, domain, path, secure, httponly, samesite, max_age,
    expires_epoch) or None when the header is ignored."""
    if not value:
        return None
    segs = value.split(";")
    nv = segs[0]
    eq = nv.find("=")
    if eq < 0:
        return None
    name = nv[:eq].strip(OWS)
    if not name:
        return None
    attrs: dict[str, str | None] = {}
    flags: set[str] = set()
    for seg in segs[1:]:
        e = seg.find("=")
        if e < 0:
            k, v = seg.strip(OWS).lower(), None
        else:
            k = seg[:e].strip(OWS).lower()
            v = seg[e + 1:].strip(OWS)
        if k:
            attrs[k] = v            # dict assignment == last wins
            flags.add(k)
    domain = attrs.get("domain")
    if domain:
        domain = domain.lower()
        if domain.startswith("."):
            domain = domain[1:]
    domain = domain or None
    path = attrs.get("path")
    if not (path and path.startswith("/")):
        path = None
    samesite = attrs.get("samesite")
    if samesite is not None:
        samesite = samesite.lower()
    ma_raw = attrs.get("max-age")
    max_age = (int(ma_raw) if ma_raw is not None
               and _MAXAGE.match(ma_raw) else None)
    return {
        "name": name,
        "value": nv[eq + 1:].strip(OWS),
        "domain": domain,
        "path": path,
        "secure": "secure" in flags,
        "httponly": "httponly" in flags,
        "samesite": samesite,
        "max_age": max_age,
        "expires_epoch": cachex.httpdate_to_epoch(
            attrs.get("expires")),
    }


def cookie_expiry(max_age, expires_epoch, fetched_epoch):
    """RFC 6265 §5.3 step 3: a valid Max-Age wins over Expires.
    Returns (persistent, resolved_expires_epoch|None); a session
    cookie is (False, None). A negative/zero lifetime still counts
    as persistent (it is an explicit deletion, not a session
    cookie)."""
    if max_age is not None:
        return True, fetched_epoch + max_age
    if expires_epoch is not None:
        return True, expires_epoch
    return False, None
