"""HTTP access-log reader (Common/Combined Log Format) — pure
Python, from scratch, Spark-free.

Server logs are the OTHER side of the crawl: the fetch-history and
politeness operators model what WE request; access logs record what
a HOST served. CLF/combined lines:

``%h %l %u [%t] "%r" %>s %b "%{Referer}" "%{User-agent}"``

- timestamp ``dd/Mon/yyyy:HH:MM:SS +ZZZZ`` -> epoch seconds via
  the SAME days-from-civil integer formula as cachex/gpxx, with
  the numeric offset APPLIED (epoch is always UTC); unknown month
  names make the line malformed;
- request line splits into (method, path, protocol) only when it
  has exactly the three parts and an ALL-UPPERCASE token method —
  anything else (garbage requests are common in real logs) keeps
  the raw request string with NULL parts;
- ``-`` means absent for ident/user/bytes/referer/UA; bytes are
  digit-gated int64;
- quoted fields handle backslash escapes (nginx escaping);
  malformed lines are counted, not emitted.
"""

from __future__ import annotations

import re

_MONTHS = {m: i + 1 for i, m in enumerate(
    ("Jan", "Feb", "Mar", "Apr", "May", "Jun",
     "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"))}

_LINE_RE = re.compile(
    r'^(\S+) (\S+) (\S+) \[([^\]]+)\] '
    r'"((?:[^"\\]|\\.)*)" (\d{3}) (-|\d{1,15})'
    r'(?: "((?:[^"\\]|\\.)*)" "((?:[^"\\]|\\.)*)")?\s*$')
_TS_RE = re.compile(
    r"^(\d{2})/([A-Za-z]{3})/(\d{4}):(\d{2}):(\d{2}):(\d{2}) "
    r"([+-])(\d{2})(\d{2})$")
_REQ_RE = re.compile(r"^([A-Z]+) (\S+) (HTTP/[0-9.]+)$")
_UNESC_RE = re.compile(r"\\(.)")


def clf_ts_to_epoch(value: str) -> int | None:
    m = _TS_RE.match(value or "")
    if not m:
        return None
    dd, mon_s, yyyy, hh, mi, ss, sign, oh, om = m.groups()
    mon = _MONTHS.get(mon_s)
    if mon is None:
        return None
    year = int(yyyy)
    y = year - (1 if mon <= 2 else 0)
    era = y // 400
    yoe = y - era * 400
    doy = (153 * (mon + (-3 if mon > 2 else 9)) + 2) // 5 \
        + int(dd) - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    days = era * 146097 + doe - 719468
    local = days * 86400 + int(hh) * 3600 + int(mi) * 60 + int(ss)
    offset = int(oh) * 3600 + int(om) * 60
    return local - offset if sign == "+" else local + offset


def _dash(v: str | None) -> str | None:
    return None if v in (None, "-", "") else _UNESC_RE.sub(r"\1", v)


def parse_access_log(payload) -> dict:
    """payload -> {"rows": [...], "n_malformed": int}; never
    raises. Each row: (pos, remote, ident, user, epoch, method,
    path, protocol, request, status, bytes_sent, referer,
    user_agent)."""
    out = {"rows": [], "n_malformed": 0}
    if payload is None:
        return out
    if isinstance(payload, (bytes, bytearray)):
        try:
            src = bytes(payload).decode("utf-8")
        except UnicodeDecodeError:
            try:
                src = bytes(payload).decode("cp1252")
            except UnicodeDecodeError:
                return out
    else:
        src = str(payload)
    for line in src.splitlines():
        if not line.strip():
            continue
        m = _LINE_RE.match(line)
        if not m:
            out["n_malformed"] += 1
            continue
        (remote, ident, user, ts, req, status, nbytes,
         referer, ua) = m.groups()
        epoch = clf_ts_to_epoch(ts)
        if epoch is None:
            out["n_malformed"] += 1
            continue
        req = _UNESC_RE.sub(r"\1", req)
        rm = _REQ_RE.match(req)
        method, path, proto = rm.groups() if rm else (None,) * 3
        out["rows"].append((
            len(out["rows"]), remote, _dash(ident), _dash(user),
            epoch, method, path, proto, req, int(status),
            None if nbytes == "-" else int(nbytes),
            _dash(referer), _dash(ua)))
    return out
