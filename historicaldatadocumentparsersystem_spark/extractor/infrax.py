"""Infrastructure response headers (Alt-Svc, Server) — pure
Python, stdlib only.

Transport/tech fingerprints are crawl-ops signals: ``Alt-Svc: h3``
adoption decides whether HTTP/3 connection reuse pays off per host;
``Server`` product tokens feed tech-stack stats and CMS-aware
extraction routing. Shared grammar for all engines (cachex
pattern); regexes stay RE2-safe.

Deterministic subset:
- Alt-Svc (RFC 7838): the exact value ``clear`` (OWS-trimmed,
  case-sensitive per spec) clears alternatives; otherwise
  alternatives split on commas OUTSIDE quoted strings (cachex
  ITEM_RE); each alternative splits on ``;`` into the
  ``proto=alt-authority`` pair and params; the authority is
  dequoted (one layer), ``host:port`` split at the LAST colon
  (empty host = same host); ``ma`` is trusted at 1-15 digits
  (default 86400 per spec), ``persist=1`` is a flag; alternatives
  with no ``=`` or a non-numeric port are dropped;
- Server (RFC 7231 product list): ``(comments)`` are skipped with
  nesting; remaining WSP-separated tokens are products, split at
  the FIRST ``/`` into (product, version|None).
"""

from __future__ import annotations

import re

from . import cachex

OWS = " \t"
PORT_RE = r"^[0-9]{1,5}$"
_PORT = re.compile(PORT_RE)
_DELTA = re.compile(cachex.DELTA_RE)
_ITEM = re.compile(cachex.ITEM_RE)
_WSP_RUN = re.compile(r"[ \t]+")

ALT_SVC_DEFAULT_MA = 86400


def _dequote(v: str) -> str:
    if len(v) >= 2 and v.startswith('"') and v.endswith('"'):
        return v[1:-1]
    return v


def parse_alt_svc(value) -> dict | None:
    """Alt-Svc value -> {clear, alts: [(pos, proto, host, port,
    ma_s, persist)]}; None when absent."""
    if not value:
        return None
    if value.strip(OWS) == "clear":
        return {"clear": True, "alts": []}
    alts = []
    for item in _ITEM.findall(value):
        segs = item.split(";")
        nv = segs[0]
        eq = nv.find("=")
        if eq < 0:
            continue
        proto = nv[:eq].strip(OWS)
        auth = _dequote(nv[eq + 1:].strip(OWS))
        if not proto:
            continue
        colon = auth.rfind(":")
        if colon < 0:
            continue
        host = auth[:colon] or None
        port = auth[colon + 1:]
        if not _PORT.match(port):
            continue
        ma = ALT_SVC_DEFAULT_MA
        persist = False
        for seg in segs[1:]:
            e = seg.find("=")
            if e < 0:
                continue
            k = seg[:e].strip(OWS).lower()
            v = _dequote(seg[e + 1:].strip(OWS))
            if k == "ma" and _DELTA.match(v):
                ma = int(v)
            elif k == "persist" and v == "1":
                persist = True
        alts.append((len(alts), proto, host, int(port), ma,
                     persist))
    return {"clear": False, "alts": alts}


def parse_server(value) -> list[tuple[int, str, str | None]]:
    """Server value -> [(pos, product, version|None)]; comments
    (nested parens) are skipped."""
    if not value:
        return []
    out: list[tuple[int, str, str | None]] = []
    depth = 0
    buf: list[str] = []
    cleaned: list[str] = []
    for ch in value:
        if ch == "(":
            depth += 1
        elif ch == ")":
            if depth:
                depth -= 1
        elif depth == 0:
            buf.append(ch)
    cleaned = "".join(buf)
    for tok in _WSP_RUN.split(cleaned):
        tok = tok.strip(OWS)
        if not tok:
            continue
        slash = tok.find("/")
        if slash < 0:
            out.append((len(out), tok, None))
        elif slash > 0:                  # '/x' has no product: drop
            out.append((len(out), tok[:slash],
                        tok[slash + 1:] or None))
    return out
