"""HTTP caching / recrawl-economics parsing (RFC 9111 subset) —
pure Python, stdlib only.

A crawl scheduler decides WHEN to refetch from response headers: the
Cache-Control grammar, the Expires/Date delta, and the RFC 9111
heuristic (10% of Date - Last-Modified) give a freshness lifetime;
validators (ETag / Last-Modified) decide whether a conditional GET
is possible. This module is the shared grammar for all engines (the
ads.txt triple-check pattern): every regex and the integer date
formula below are GENERATED into the DuckDB twin, so keep them
RE2-safe (no lookaround, no backreferences).

Deterministic subset:
- Cache-Control splits into items on commas OUTSIDE quoted strings
  (``ITEM_RE`` — each item is a maximal run of non-comma/non-quote
  chars and complete quoted strings; an unterminated quote starts a
  new scan position identically under Python re and RE2);
- an item matches ``DIRECTIVE_RE`` (token name, optional ``=`` then
  token or quoted-string argument) or is dropped (parse error);
  names lowercase; an empty argument normalizes to None;
- HTTP dates accept STRICT IMF-fixdate only (``HTTP_DATE_RE``);
  epoch seconds come from the days-from-civil integer formula (all
  quantities non-negative for 4-digit years, so truncating division
  agrees across Spark div / DuckDB ``//`` / Python ``//``);
- delta-seconds arguments are trusted only when 1-15 digits
  (``DELTA_RE``) — both engines stay inside int64;
- freshness precedence: s-maxage > max-age > (Expires - Date,
  floored at 0; an unparseable-but-present Expires means already
  stale) > heuristic (Date - Last-Modified) // 10. Each of the last
  two needs a parseable Date.
"""

from __future__ import annotations

import re

# maximal runs of [not comma/quote | complete quoted string]
ITEM_RE = r'(?:[^,"]|"[^"]*")+'
# token name, optional = token-or-quoted argument; OWS tolerated
DIRECTIVE_RE = (r'^[ \t]*([0-9A-Za-z!#$%&\'*+.^_`|~-]+)[ \t]*'
                r'(?:=[ \t]*(?:"([^"]*)"|([^ \t",;]*)))?[ \t]*$')
HTTP_DATE_RE = (r'^[A-Za-z]{3}, ([0-9]{2}) ([A-Za-z]{3}) '
                r'([0-9]{4}) ([0-9]{2}):([0-9]{2}):([0-9]{2}) GMT$')
DELTA_RE = r'^[0-9]{1,15}$'
MONTHS = ("Jan", "Feb", "Mar", "Apr", "May", "Jun",
          "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")

_ITEM = re.compile(ITEM_RE)
_DIRECTIVE = re.compile(DIRECTIVE_RE)
_HTTP_DATE = re.compile(HTTP_DATE_RE)
_DELTA = re.compile(DELTA_RE)
_MONTH_NO = {m: i + 1 for i, m in enumerate(MONTHS)}


def parse_cache_control(value) -> list[tuple[int, str, str | None]]:
    """Cache-Control value -> [(pos, directive_lower, arg|None)].
    Malformed items drop; empty arguments normalize to None (so
    ``foo=""`` == ``foo`` — the one lossy simplification, shared by
    the DuckDB twin where an unmatched group is indistinguishable
    from an empty one). None/empty input yields no rows."""
    out: list[tuple[int, str, str | None]] = []
    for item in _ITEM.findall(value or ""):
        m = _DIRECTIVE.match(item)
        if not m:
            continue
        name, quoted, token = m.groups()
        arg = quoted if quoted is not None else token
        out.append((len(out), name.lower(), arg or None))
    return out


def httpdate_to_epoch(value) -> int | None:
    """Strict IMF-fixdate -> epoch seconds via the days-from-civil
    integer formula (no datetime module — the formula IS the
    cross-engine contract). Unknown month names reject; day/time
    digits are taken as-is (garbage-in computes the same garbage in
    every engine). None on any mismatch."""
    m = _HTTP_DATE.match(value or "")
    if not m:
        return None
    day, mon_s, year, hh, mm, ss = m.groups()
    mon = _MONTH_NO.get(mon_s)
    if mon is None:
        return None
    y = int(year) - (1 if mon <= 2 else 0)
    era = y // 400
    yoe = y - era * 400
    doy = (153 * (mon + (-3 if mon > 2 else 9)) + 2) // 5 \
        + int(day) - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    days = era * 146097 + doe - 719468
    return days * 86400 + int(hh) * 3600 + int(mm) * 60 + int(ss)


def _delta(arg) -> int | None:
    return int(arg) if arg is not None and _DELTA.match(arg) else None


def cache_policy(cache_control, hdr_age, hdr_date, hdr_expires,
                 hdr_last_modified, hdr_etag) -> dict:
    """One response's headers -> the recrawl policy row:
    {no_store, no_cache, private, immutable, must_revalidate,
     age_s, ttl_s, ttl_source, fresh_for_s, has_etag, etag_weak,
     has_last_modified}. ttl_s/ttl_source/fresh_for_s are None when
    no freshness basis exists."""
    ds = dict()
    for _, name, arg in parse_cache_control(cache_control):
        ds.setdefault(name, arg)   # first occurrence wins
    age = _delta(hdr_age) or 0
    date_e = httpdate_to_epoch(hdr_date)
    lastmod_e = httpdate_to_epoch(hdr_last_modified)
    ttl, src = None, None
    s_maxage = _delta(ds.get("s-maxage"))
    max_age = _delta(ds.get("max-age"))
    if s_maxage is not None:
        ttl, src = s_maxage, "s-maxage"
    elif max_age is not None:
        ttl, src = max_age, "max-age"
    elif hdr_expires is not None and date_e is not None:
        exp_e = httpdate_to_epoch(hdr_expires)
        ttl = max(exp_e - date_e, 0) if exp_e is not None else 0
        src = "expires"
    elif (date_e is not None and lastmod_e is not None
          and date_e >= lastmod_e):
        ttl, src = (date_e - lastmod_e) // 10, "heuristic"
    etag = hdr_etag or ""
    return {
        "no_store": "no-store" in ds,
        "no_cache": "no-cache" in ds,
        "private": "private" in ds,
        "immutable": "immutable" in ds,
        "must_revalidate": ("must-revalidate" in ds
                            or "proxy-revalidate" in ds),
        "age_s": age,
        "ttl_s": ttl,
        "ttl_source": src,
        "fresh_for_s": max(ttl - age, 0) if ttl is not None else None,
        "has_etag": etag != "",
        "etag_weak": etag.startswith("W/"),
        "has_last_modified": lastmod_e is not None,
    }


# --- Vary / Retry-After (the cache family's other two headers) ---------------
# Vary fragments the cache key: Vary: User-Agent on a corpus capture
# means the stored body is ONE of many variants (cloaking risk and a
# dedup caveat); Vary: * is uncacheable outright. Retry-After drives
# throttle backoff (429/503) as either delta-seconds or an IMF date.

TOKEN_TRIM_RE = r"^[ \t]+|[ \t]+$"
_TOKEN_TRIM = re.compile(TOKEN_TRIM_RE)


def parse_vary(value) -> list[str]:
    """Vary header -> lowercased token list (comma split, OWS
    trimmed, empties dropped). None/empty yield []."""
    out = []
    for tok in (value or "").split(","):
        t = _TOKEN_TRIM.sub("", tok).lower()
        if t:
            out.append(t)
    return out


def retry_after_epoch(value, fetched_epoch) -> int | None:
    """Retry-After header -> epoch seconds of the earliest next
    attempt: delta-seconds add to ``fetched_epoch``; an IMF-fixdate
    stands alone (a past date means retry-at-once, which compares
    correctly without clamping); anything else is None."""
    if value is None:
        return None
    v = _TOKEN_TRIM.sub("", value)
    if _DELTA.match(v):
        return fetched_epoch + int(v)
    return httpdate_to_epoch(v)


ETAG_WEAK_RE = r"^W/"
_ETAG_WEAK = re.compile(ETAG_WEAK_RE)


def etag_match(a, b) -> bool:
    """If-None-Match WEAK comparison (RFC 9110 §8.8.3.2): the W/
    prefix is ignored on both sides; empty/absent never matches."""
    if a is None or b is None:
        return False
    sa = _ETAG_WEAK.sub("", a)
    sb = _ETAG_WEAK.sub("", b)
    return sa == sb and sa != ""
