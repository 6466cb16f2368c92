"""security.txt parsing (RFC 9116) — pure Python, stdlib only.

``/.well-known/security.txt`` joins robots.txt and ads.txt in the
well-known family the crawl side fetches per host: for a corpus
pipeline it is a host-hygiene signal (a maintained contact+expiry
means an operated site; an expired file means rot) and a
deduplicable contact-surface record.

Grammar subset (deterministic, shared by all three engines — the
ads.txt triple-check pattern):
- lines split on ``\\n`` (``\\r`` stripped); a field line is
  ``Name: value`` (one space after the colon optional, value
  trimmed with the ASCII space/tab class);
- field NAMES are matched case-insensitively against the RFC 9116
  registry (contact, expires, encryption, canonical, policy,
  preferred-languages, acknowledgments, hiring) — unknown names are
  ignored, which also keeps PGP clearsign ``Hash:`` headers out;
- OpenPGP clearsigned files: every line at or after the FIRST
  ``-----BEGIN PGP SIGNATURE-----`` is dropped (the signature
  block); the signed-message banner and hash headers fall out via
  the registry rule — set-based, so the distributed twin is one
  window, not a stateful scan;
- full-line ``#`` comments are ignored (the registry rule covers
  them too — kept explicit for readability);
- ``line_no`` is the 1-based physical line number;
- the gate: a file is well-formed iff it has >=1 contact AND >=1
  expires; expiry comparison uses the LEXICOGRAPHIC order of
  RFC 3339 Z-form timestamps against a caller-supplied literal
  (exact, no timezone math; non-Z values compare as unknown ->
  not expired, the lenient reading).
"""

from __future__ import annotations

import re

FIELDS = ("acknowledgments", "canonical", "contact", "encryption",
          "expires", "hiring", "policy", "preferred-languages")
SIG_MARKER = "-----BEGIN PGP SIGNATURE-----"
FIELD_RE = r"^([A-Za-z-]+):[ \t]*(.*[^ \t]|)[ \t]*$"
# Z-form RFC 3339 (the only shape the lexicographic gate trusts)
ZTS_RE = r"^[0-9]{4}-[0-9]{2}-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2}Z$"

_FIELD = re.compile(FIELD_RE)
_ZTS = re.compile(ZTS_RE)


def parse_security_txt(text) -> list[tuple[int, str, str]]:
    """-> [(line_no, field_lower, value)] for registry fields before
    any PGP signature block; None/empty/junk yield no rows."""
    out: list[tuple[int, str, str]] = []
    for line_no, raw in enumerate((text or "").split("\n"), start=1):
        line = raw.replace("\r", "")
        if line == SIG_MARKER:
            break
        m = _FIELD.match(line)
        if not m:
            continue
        name = m.group(1).lower()
        value = m.group(2)
        if name in FIELDS and value:
            out.append((line_no, name, value))
    return out


def security_txt_gate(text, now_z: str) -> dict:
    """{n_contact, n_fields, expires, well_formed, expired} — the
    host-hygiene gate. ``now_z`` is a Z-form RFC 3339 literal;
    ``expired`` is None when no trusted (Z-form) expiry exists."""
    rows = parse_security_txt(text)
    contacts = [v for _, f, v in rows if f == "contact"]
    expires = [v for _, f, v in rows if f == "expires"]
    first_exp = expires[0] if expires else None
    expired = None
    if first_exp is not None and _ZTS.match(first_exp):
        expired = first_exp <= now_z
    return {"n_contact": len(contacts), "n_fields": len(rows),
            "expires": first_exp,
            "well_formed": bool(contacts) and bool(expires),
            "expired": expired}
