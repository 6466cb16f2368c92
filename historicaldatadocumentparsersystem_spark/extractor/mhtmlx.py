"""MHTML / MIME-HTML web archives (.mht) — pure Python, Spark-free.

The single-file page snapshot format browsers emit ("Save as MHTML",
Chrome's Snapshot-Content-Location flavor) and the RFC 2557 wire
form: a ``multipart/related`` MIME envelope whose root part is the
page HTML and whose sibling parts are the page's resources, each
addressed by ``Content-Location`` (a URL) and/or ``Content-ID``.

Reuses the mailx MIME machinery (header unfolding, boundary split,
base64/qp transfer decoding, charset fallback) with its OWN part
walk because MHTML semantics live in per-part headers mailx's mail
view discards:

- root selection: the ``start`` parameter of multipart/related names
  the root part's Content-ID; absent that, the FIRST part is the
  root (RFC 2557 §3.1);
- every part keeps (content_type, content_location, content_id,
  decoded size); text parts also keep decoded text;
- the snapshot URL: top-level ``Snapshot-Content-Location`` header
  (Chrome), else the root part's Content-Location;
- nested multiparts flatten in tree order (depth-capped like mailx).

``build_mhtml`` is the encode half for fixtures and must decode
through this parser (the exifx rule).
"""

from __future__ import annotations

import base64

from .mailx import (_b64_decode, _decode_charset, _get,
                    _parse_content_type, _qp_decode, _split_headers,
                    _split_multipart)


def _walk(headers, body, parts, depth=0):
    ctype, params = _parse_content_type(_get(headers, "content-type"))
    if (ctype.startswith("multipart/") and params.get("boundary")
            and depth <= 8):
        for sub in _split_multipart(body, params["boundary"]):
            sh, sb = _split_headers(sub)
            _walk(sh, sb, parts, depth + 1)
        return
    cte = _get(headers, "content-transfer-encoding").strip().lower()
    if cte == "base64":
        payload = _b64_decode(body)
    elif cte == "quoted-printable":
        payload = _qp_decode(body)
    else:
        payload = body
    text = ""
    if ctype.startswith("text/"):
        text = _decode_charset(payload, params.get("charset", ""))
        text = text.replace("\r\n", "\n").replace("\r", "\n")
    parts.append({
        "pos": len(parts),
        "content_type": ctype,
        "content_location": _get(headers, "content-location").strip()
        or None,
        "content_id": (_get(headers, "content-id").strip()
                       .strip("<>")) or None,
        "size": len(payload),
        "text": text,
    })


def parse_mhtml(payload) -> dict:
    """MHTML bytes -> {url, root_pos, parts}; parts in tree order.

    Returns ``parts: []`` (and url/root None) for anything that is
    not a multipart/related envelope — never raises."""
    out = {"url": None, "root_pos": None, "parts": []}
    if payload is None:
        return out
    if isinstance(payload, str):
        payload = payload.encode("utf-8", "replace")
    try:
        headers, body = _split_headers(bytes(payload))
        ctype, params = _parse_content_type(
            _get(headers, "content-type"))
        if ctype != "multipart/related" or not params.get("boundary"):
            return out
        parts: list[dict] = []
        _walk(headers, body, parts)
    except Exception:
        return out
    if not parts:
        return out
    root_pos = 0
    start = params.get("start", "").strip().strip("<>")
    if start:
        for p in parts:
            if p["content_id"] == start:
                root_pos = p["pos"]
                break
    snap = _get(headers, "snapshot-content-location").strip()
    out["url"] = snap or parts[root_pos]["content_location"]
    out["root_pos"] = root_pos
    out["parts"] = parts
    return out


def root_html(payload) -> tuple:
    """(snapshot url, root part's decoded HTML text) — ('' text when
    the root is not text/html or the payload is not MHTML)."""
    d = parse_mhtml(payload)
    if d["root_pos"] is None:
        return None, ""
    root = d["parts"][d["root_pos"]]
    if not root["content_type"].startswith("text/html"):
        return d["url"], ""
    return d["url"], root["text"]


# --- encode half ---------------------------------------------------------

def _qp_body(text: str) -> bytes:
    """Minimal deterministic quoted-printable body encoder (no soft
    wrapping needed for fixtures — lines stay short)."""
    out = []
    for line in text.split("\n"):
        buf = []
        for ch in line:
            b = ch.encode("utf-8")
            if ch in "=\t" or not (32 <= ord(ch) < 127):
                buf.extend(f"={x:02X}" for x in b)
            else:
                buf.append(ch)
        out.append("".join(buf))
    return "\r\n".join(out).encode("ascii")


def build_mhtml(boundary: str, parts: list[dict],
                snapshot_url: str = None,
                start: str = None) -> bytes:
    """parts: dicts with content_type, and optionally location, cid,
    body (bytes -> base64) or text (str -> quoted-printable)."""
    lines = [b"From: <Saved by certified-fixture-builder>"]
    if snapshot_url:
        lines.append(b"Snapshot-Content-Location: "
                     + snapshot_url.encode("ascii"))
    lines.append(b"Subject: fixture snapshot")
    lines.append(b"MIME-Version: 1.0")
    ct = (f'Content-Type: multipart/related; type="text/html"; '
          f'boundary="{boundary}"')
    if start:
        ct += f'; start="<{start}>"'
    lines.append(ct.encode("ascii"))
    lines.append(b"")
    for p in parts:
        lines.append(b"--" + boundary.encode("ascii"))
        lines.append(b"Content-Type: " + p["content_type"]
                     .encode("ascii"))
        if p.get("cid"):
            lines.append(b"Content-ID: <" + p["cid"].encode("ascii")
                         + b">")
        if p.get("location"):
            lines.append(b"Content-Location: "
                         + p["location"].encode("ascii"))
        if "text" in p:
            lines.append(
                b"Content-Transfer-Encoding: quoted-printable")
            lines.append(b"")
            lines.append(_qp_body(p["text"]))
        else:
            lines.append(b"Content-Transfer-Encoding: base64")
            lines.append(b"")
            b64 = base64.b64encode(p.get("body", b""))
            lines.extend(b64[i:i + 72]
                         for i in range(0, max(len(b64), 1), 72))
    lines.append(b"--" + boundary.encode("ascii") + b"--")
    lines.append(b"")
    return b"\r\n".join(lines)
