"""HAR (HTTP Archive, devtools export) reader — pure Python,
stdlib json, Spark-free.

The third capture container next to WARC (``warcx``) and WACZ
(``waczx``): browsers and crawl QA tooling export page loads as HAR
1.2 JSON. Like the WACZ view this is INDEX-ONLY — response bodies
stay in the archive; we read the request/response metadata that
feeds fetch-planning and page-weight analytics.

Deterministic subset (HAR 1.2):
- ``log.pages``: (page id, startedDateTime, title, onContentLoad /
  onLoad page timings in exact milliseconds as given);
- ``log.entries`` in document order: (pos, pageref, startedDateTime,
  method, request url, response status + statusText, response
  content mimeType (parameters stripped, lowercased), response
  bodySize, content.size, total entry time, serverIPAddress,
  httpVersion);
- sizes: ``-1`` (unknown, per spec) normalizes to None; negative
  times likewise;
- a payload that is not a JSON object with a ``log.entries`` list
  yields zero rows — never raises.

Timing fields are JSON numbers; they are kept as float milliseconds
verbatim (no arithmetic is done on them here, so cross-engine float
identity holds trivially through the golden parquet).
"""

from __future__ import annotations

import json


def _s(v):
    return v if isinstance(v, str) else None


def _num(v):
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        return None
    return float(v)


def _size(v):
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        return None
    n = int(v)
    return n if 0 <= n <= 2**31 - 1 else None   # -1 = unknown


def _mime(v):
    if not isinstance(v, str) or not v:
        return None
    return v.split(";", 1)[0].strip().lower() or None


def parse_har(payload) -> dict:
    """HAR bytes/str -> {"pages": [...], "entries": [...]}."""
    out = {"pages": [], "entries": []}
    if payload is None:
        return out
    if isinstance(payload, (bytes, bytearray)):
        try:
            payload = bytes(payload).decode("utf-8")
        except UnicodeDecodeError:
            return out
    try:
        doc = json.loads(payload)
    except Exception:
        return out
    log = doc.get("log") if isinstance(doc, dict) else None
    if not isinstance(log, dict):
        return out
    pages = log.get("pages")
    if isinstance(pages, list):
        for p in pages:
            if not isinstance(p, dict):
                continue
            t = p.get("pageTimings")
            t = t if isinstance(t, dict) else {}
            out["pages"].append({
                "page_id": _s(p.get("id")),
                "started": _s(p.get("startedDateTime")),
                "title": _s(p.get("title")),
                "on_content_load_ms": _pos_ms(t.get("onContentLoad")),
                "on_load_ms": _pos_ms(t.get("onLoad")),
            })
    entries = log.get("entries")
    if isinstance(entries, list):
        for e in entries:
            if not isinstance(e, dict):
                continue
            req = e.get("request")
            req = req if isinstance(req, dict) else {}
            resp = e.get("response")
            resp = resp if isinstance(resp, dict) else {}
            content = resp.get("content")
            content = content if isinstance(content, dict) else {}
            status = resp.get("status")
            if isinstance(status, bool) or not isinstance(status, int):
                status = None
            elif not 0 <= status <= 999:
                status = None
            out["entries"].append({
                "pos": len(out["entries"]),  # emitted-row order
                "pageref": _s(e.get("pageref")),
                "started": _s(e.get("startedDateTime")),
                "method": _s(req.get("method")),
                "request_url": _s(req.get("url")),
                "status": status,
                "status_text": _s(resp.get("statusText")),
                "mime": _mime(content.get("mimeType")),
                "body_size": _size(resp.get("bodySize")),
                "content_size": _size(content.get("size")),
                "time_ms": _pos_ms(e.get("time")),
                "server_ip": _s(e.get("serverIPAddress")),
                "http_version": _s(resp.get("httpVersion")),
            })
    return out


def _pos_ms(v):
    n = _num(v)
    return n if n is not None and n >= 0 else None


def build_har(pages: list[dict], entries: list[dict],
              creator: str = "fixture-builder/1.0") -> bytes:
    """Encode half for fixtures (sorted keys, must round-trip)."""
    log = {
        "version": "1.2",
        "creator": {"name": creator.split("/")[0],
                    "version": creator.split("/")[-1]},
        "pages": pages,
        "entries": entries,
    }
    return json.dumps({"log": log}, sort_keys=True,
                      ensure_ascii=False).encode("utf-8")
