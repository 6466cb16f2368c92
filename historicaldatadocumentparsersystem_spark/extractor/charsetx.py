"""Charset diagnostics + mojibake repair (Spark-free, the oracle).

Web payloads arrive as bytes in whatever encoding the origin server
chose (or mis-declared). The engine's decode itself lives in
``htmlx.decode_payload`` (BOM -> declared charset -> utf-8, pinned by
the golden extraction parquet); this module is the DIAGNOSTICS and
REPAIR layer a crawl pipeline runs alongside it:

- ``sniff_charset``: explains the decode — which codec, from which
  signal (BOM / declaration / default), whether the payload is strict
  UTF-8, whether the declaration actually holds, and how many
  U+FFFD replacements the lossy decode produces. The charset/priority
  logic mirrors ``decode_payload`` EXACTLY (equivalence is pinned by
  tests/test_charset.py across every fixture corpus), so the profile
  is a faithful explanation of what the engine did.
- ``fix_mojibake``: deterministic ftfy-core repair of the classic
  UTF-8-bytes-read-as-cp1252 double encoding ("Ã©" -> "é"),
  iterated for doubly-encoded text. Whole-string and conservative: a
  pass applies only when the ENTIRE text round-trips (sloppy-cp1252
  encode -> strict UTF-8 decode), so genuine Latin text ("café")
  can never be corrupted — its lone 0xE9 byte is not valid UTF-8.
- ``mojibake_score``: cheap detector — count of cp1252 lead bytes
  (0xC2-0xF4 range chars) followed by a continuation-range char, the
  signature ftfy calls "UTF-8 curls".

Reference analog: the reference's loaders inherit whatever requests/
bs4 guess (implicit and environment-dependent); this makes the policy
explicit, deterministic and testable. The cp1252 "sloppy" codec
(the 5 undefined bytes 0x81 0x8D 0x8F 0x90 0x9D pass through as
U+0081..U+009D, matching WHATWG windows-1252 and ftfy's
sloppy-windows-1252) is what real browsers produce, so repair covers
text mangled via either latin-1 or cp1252.
"""
from __future__ import annotations

import re

from .htmlx import _CHARSET_RE

SNIFF_FIELDS = ["charset", "source", "declared", "declared_ok",
                "utf8_valid", "n_replacements"]

# WHATWG windows-1252: the five bytes cp1252 leaves undefined decode to
# the matching C1 controls (what browsers and ftfy's sloppy codec do).
_HOLES = frozenset((0x81, 0x8D, 0x8F, 0x90, 0x9D))
_B2C = {b: (chr(b) if b in _HOLES else bytes((b,)).decode("cp1252"))
        for b in range(256)}
_C2B = {c: b for b, c in _B2C.items()}
for _b in range(0x80, 0xA0):
    # latin-1 fallback for the C1 controls cp1252 maps elsewhere: text
    # mangled via a latin-1 (not cp1252) mis-decode carries raw C1
    # chars, and re-encoding them as their ordinal byte is what lets
    # the repair cover BOTH mis-decode flavors (ftfy's sloppy codec).
    _C2B.setdefault(chr(_b), _b)

# charset aliases seen in the wild, normalized to codec names python
# resolves; unknown tokens fall back at decode time (LookupError).
_ALIASES = {"iso-8859-1": "latin-1", "iso8859-1": "latin-1",
            "latin1": "latin-1", "windows-1252": "cp1252",
            "win-1252": "cp1252", "utf8": "utf-8"}


def sloppy_cp1252_decode(payload: bytes) -> str:
    """windows-1252 per WHATWG: total (every byte maps), the browser
    behavior that produces repairable mojibake."""
    return "".join(_B2C[b] for b in payload)


def _sloppy_encode(text: str) -> bytes | None:
    """Inverse of ``sloppy_cp1252_decode``; None when any char has no
    windows-1252 byte (the conservative whole-string repair gate)."""
    out = bytearray()
    for c in text:
        b = _C2B.get(c)
        if b is None:
            return None
        out.append(b)
    return bytes(out)


def sniff_charset(payload: bytes) -> dict:
    """Explain what ``htmlx.decode_payload`` does with this payload.

    Returns SNIFF_FIELDS:
      charset        codec the engine decodes with (normalized)
      source         'bom-utf8' | 'bom-utf16le' | 'bom-utf16be' |
                     'declared' | 'default'
      declared       first charset token declared in the leading 2 KiB
                     (lowered), even when a BOM outranks it; None if
                     absent
      declared_ok    strict decode under the declared codec succeeds
                     (False also for unknown codecs); None if nothing
                     is declared
      utf8_valid     the BOM-stripped payload is strict UTF-8
      n_replacements U+FFFD count in the text the engine's decode
                     yields (lossy-decode damage, 0 when clean)
    """
    declared = None
    m = _CHARSET_RE.search(payload[:2048])
    if m:
        declared = m.group(1).decode("ascii", errors="replace").lower()
    declared_codec = _ALIASES.get(declared, declared) if declared else None
    declared_ok = None
    if declared is not None:
        try:
            payload.decode(declared_codec)
            declared_ok = True
        except (LookupError, UnicodeDecodeError, ValueError):
            declared_ok = False

    if payload.startswith(b"\xef\xbb\xbf"):
        charset, source, body = "utf-8", "bom-utf8", payload[3:]
        text = body.decode("utf-8", errors="replace")
    elif payload.startswith(b"\xff\xfe"):
        charset, source, body = "utf-16-le", "bom-utf16le", payload[2:]
        text = body.decode("utf-16-le", errors="replace")
    elif payload.startswith(b"\xfe\xff"):
        charset, source, body = "utf-16-be", "bom-utf16be", payload[2:]
        text = body.decode("utf-16-be", errors="replace")
    else:
        body = payload
        charset, source = "utf-8", "default"
        if declared is not None:
            # decode_payload tries the declared token and only falls
            # back to utf-8 when the codec name is unknown
            try:
                text = payload.decode(declared, errors="replace")
                charset, source = (declared_codec or declared), "declared"
            except LookupError:
                text = payload.decode("utf-8", errors="replace")
        else:
            text = payload.decode("utf-8", errors="replace")

    try:
        body.decode("utf-8")
        utf8_valid = True
    except UnicodeDecodeError:
        utf8_valid = False

    return {"charset": charset, "source": source, "declared": declared,
            "declared_ok": declared_ok, "utf8_valid": utf8_valid,
            "n_replacements": text.count("�")}


def decode_with_sniff(payload: bytes) -> tuple[str, dict]:
    """(text, sniff dict) — the text is byte-identical to
    ``htmlx.decode_payload(payload)`` (pinned by tests)."""
    s = sniff_charset(payload)
    if s["source"] == "bom-utf8":
        return payload[3:].decode("utf-8", errors="replace"), s
    if s["source"] == "bom-utf16le":
        return payload[2:].decode("utf-16-le", errors="replace"), s
    if s["source"] == "bom-utf16be":
        return payload[2:].decode("utf-16-be", errors="replace"), s
    if s["source"] == "declared":
        return payload.decode(s["declared"], errors="replace"), s
    return payload.decode("utf-8", errors="replace"), s


# UTF-8 lead chars (as seen through cp1252) followed by a char whose
# windows-1252 byte is a UTF-8 continuation byte (0x80-0xBF): the
# mojibake signature. Lead range C2-F4 is every legal UTF-8 lead.
_MOJI_LEAD = frozenset(_B2C[b] for b in range(0xC2, 0xF5))
_MOJI_CONT = frozenset(_B2C[b] for b in range(0x80, 0xC0))


def mojibake_score(text: str) -> int:
    """Count of lead+continuation char bigrams — 0 on clean text,
    >= 1 per mangled multibyte sequence. Pure detector (no decode
    attempt), cheap enough to run as a gate column at corpus scale."""
    hits = 0
    for a, b in zip(text, text[1:]):
        if a in _MOJI_LEAD and b in _MOJI_CONT:
            hits += 1
    return hits


def fix_mojibake(text: str, max_passes: int = 3) -> tuple[str, int]:
    """Undo UTF-8-read-as-windows-1252 mangling; (fixed, n_passes).

    One pass = sloppy-cp1252 encode the WHOLE string, strict-decode it
    as UTF-8; applied only when both steps succeed and the text
    changes, then retried (doubly-encoded text needs two). Conservative
    by construction: genuine Latin-1/cp1252 text fails the strict
    UTF-8 step (a lone 0xE9 is no UTF-8 sequence) and text with any
    non-cp1252 char (CJK, emoji) fails the encode step — both return
    unchanged with 0 passes. Deterministic, total, stdlib-only.
    """
    cur = text
    passes = 0
    while passes < max_passes:
        # cheap reject: a pass can only apply when a lead+continuation
        # bigram exists (strict UTF-8 decode needs one), so clean text
        # skips the encode/decode attempt entirely
        if mojibake_score(cur) == 0:
            break
        raw = _sloppy_encode(cur)
        if raw is None:
            break
        try:
            dec = raw.decode("utf-8")
        except UnicodeDecodeError:
            break
        if dec == cur:
            break
        cur = dec
        passes += 1
    return cur, passes


def fix_mojibake_str(s: str, max_passes: int = 2) -> str:
    """String-in/string-out form (the ``functions.fix_mojibake``
    pandas-UDF oracle; 2 passes = the historical UDF contract)."""
    return fix_mojibake(s, max_passes)[0]


def mojibake_corrupt_str(s: str) -> str:
    """The defect itself (test/fixture helper): mis-decode the text's
    UTF-8 bytes as sloppy windows-1252 — exactly what a crawler that
    trusts a wrong charset header does. Inverse of one repair pass."""
    return sloppy_cp1252_decode(s.encode("utf-8"))


_WS_RE = re.compile(r"\s+")


def encoding_profile(payload: bytes) -> dict:
    """The full per-document row the ``encoding_profile`` operator
    emits: sniff fields + repaired text + mojibake counters."""
    text, s = decode_with_sniff(payload)
    before = mojibake_score(text)
    fixed, passes = fix_mojibake(text)
    return {**s,
            "mojibake_passes": passes,
            "moji_hits_before": before,
            "moji_hits_after": mojibake_score(fixed),
            "text": fixed}
