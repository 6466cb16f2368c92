"""Timestamp mining from structured identifiers — pure Python,
from scratch, Spark-free.

Modern IDs smuggle their mint time: UUIDv1 (60-bit count of 100 ns
intervals since 1582-10-15), UUIDv7 (48-bit unix ms up front), ULID
(48-bit ms in Crockford base32), Twitter-style snowflakes (ms since
the 2010 epoch in the high 41 bits). Recovering those clocks from
crawl/log ids gives temporal signal where no date column exists —
the id-side sibling of ``extractor/datex.py``.

All grammars and arithmetic here are integer-exact and re-derived
by the DuckDB twin from the SAME constants (regexes, epochs, the
Crockford alphabet) — nothing is golden-pinned; both engines
compute from raw strings.

Classification ladder (first match wins):
  uuid1/uuid4/uuid7/uuid  exact 8-4-4-4-12 lowercase/uppercase hex,
                          version nibble at char 14
  ulid                    26 Crockford chars, first char <= '7'
                          (the 48-bit ms bound)
  snowflake               10-19 digit integer whose decoded ms
                          lands in [SNOWFLAKE_MIN_MS,
                          SNOWFLAKE_MAX_MS) — else plain "int"
  int / unknown           everything else
"""

from __future__ import annotations

import re

UUID_RE = (r"^([0-9a-fA-F]{8})-([0-9a-fA-F]{4})-([0-9a-fA-F]{4})"
           r"-([0-9a-fA-F]{4})-([0-9a-fA-F]{12})$")
ULID_RE = r"^[0-7][0-9A-HJKMNP-TV-Z]{25}$"
INT_RE = r"^[0-9]{10,19}$"

CROCKFORD = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"

# 1582-10-15 -> 1970-01-01 in 100 ns ticks (the RFC 4122 offset)
GREGORIAN_OFFSET_100NS = 122192928000000000
# Twitter snowflake epoch (2010-11-04T01:42:54.657Z)
SNOWFLAKE_EPOCH_MS = 1288834974657
# plausibility window for the snowflake reading: [2015-01-01, 2040)
# — a floor at the epoch itself would read EVERY small integer as a
# just-post-epoch snowflake (id >> 22 collapses to ~0)
SNOWFLAKE_MIN_MS = 1420070400000
SNOWFLAKE_MAX_MS = 2208988800000

_UUID = re.compile(UUID_RE)
_ULID = re.compile(ULID_RE)
_INT = re.compile(INT_RE)


def classify_id(s) -> tuple[str | None, int | None]:
    """id string -> (kind, ts_ms); (None, None) for a None input.
    ts_ms is unix milliseconds, NULL for kinds without a clock."""
    if s is None:
        return (None, None)
    s = str(s)
    m = _UUID.match(s)
    if m:
        ver = s[14].lower()
        if ver == "1":
            t_low = int(m.group(1), 16)
            t_mid = int(m.group(2), 16)
            t_hi = int(m.group(3), 16) & 0x0FFF
            ticks = (t_hi << 48) | (t_mid << 32) | t_low
            if ticks < GREGORIAN_OFFSET_100NS:
                # pre-1970 clock: bogus v1 — keep the kind, no ts
                # (also keeps the div on non-negatives, the
                # truncate-vs-floor engine rule)
                return ("uuid1", None)
            return ("uuid1",
                    (ticks - GREGORIAN_OFFSET_100NS) // 10000)
        if ver == "7":
            ms = int(m.group(1) + m.group(2), 16)
            return ("uuid7", ms)
        if ver == "4":
            return ("uuid4", None)
        return ("uuid", None)
    if _ULID.match(s):
        ms = 0
        for ch in s[:10]:
            ms = ms * 32 + CROCKFORD.index(ch)
        return ("ulid", ms)
    if _INT.match(s):
        val = int(s)
        if val < (1 << 63):
            ms = (val >> 22) + SNOWFLAKE_EPOCH_MS
            if SNOWFLAKE_MIN_MS <= ms < SNOWFLAKE_MAX_MS:
                return ("snowflake", ms)
        return ("int", None)
    return ("unknown", None)
