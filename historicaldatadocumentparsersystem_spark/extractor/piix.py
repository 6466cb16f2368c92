"""PII detection and redaction over plain text — the pre-release
hygiene pass a training-data pipeline runs after extraction and
quality gating (emails, phone numbers, IPv4 addresses, payment-card
numbers), per the C4/Dolma/FineWeb convention of regex-scoped
anonymization.

Spark-free on purpose (the repo invariant): this module is the
correctness oracle. The distributed operators in
``operators/pii.py`` re-express the SAME pattern constants as
JVM-side ``regexp_extract_all`` / ``regexp_replace`` plans (no
Python in the hot path), and the DuckDB driver twin re-expresses
them again in RE2 — a triple cross-engine check (Python re vs Java
regex vs RE2) that only holds because every pattern below sticks to
the common subset: explicit ``[0-9]``/``[A-Za-z]`` classes (never
``\\d``/``\\w``/``\\s``), no lookaround, no backreferences, and
``\\b`` only against ASCII context (Python's ``\\b`` is
Unicode-aware while Java's and RE2's default to ASCII word chars, so
fixtures never place a non-ASCII letter adjacent to a digit run).

Detection is precision-oriented: each kind pairs a regex with a
validity post-filter (Luhn for cards, octet range for IPv4, digit
count for phones). Redaction is recall-oriented: it masks every raw
regex candidate, validity ignored — masking a Luhn-failing number
costs nothing, leaking a real one does.

Reference analog: the reference strips/normalizes documents
row-at-a-time before LLM calls (utils/tools.py:84-99); this is the
corpus-scale anonymization counterpart, which its single-process
engine never needed to express.
"""

from __future__ import annotations

import re

# Shared pattern constants — the single source of truth for the pure
# scanner, the Spark operators, and the generated DuckDB oracle SQL
# (the _W_SQL precedent: constants are GENERATED into SQL, never
# retyped).  Common-subset regex only; see the module docstring.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}(?:[.][0-9]{1,3}){3}\b"
CARD_RE = r"\b[0-9]{4}(?:[- ][0-9]{4}){3}\b|\b[0-9]{13,19}\b"
PHONE_RE = r"\+[1-9][0-9 ()-]{5,16}[0-9]|\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"

PATTERNS: dict[str, str] = {
    "email": EMAIL_RE,
    "ipv4": IPV4_RE,
    "card": CARD_RE,
    "phone": PHONE_RE,
}

# Redaction applies kinds in this fixed order so all three engines
# rewrite identically (masks contain no digits or '@', so a later
# pattern can never match inside an earlier mask).
REDACT_ORDER: tuple[str, ...] = ("email", "card", "ipv4", "phone")
MASKS: dict[str, str] = {
    "email": "[EMAIL]",
    "card": "[CARD]",
    "ipv4": "[IP]",
    "phone": "[PHONE]",
}

_COMPILED = {kind: re.compile(pat) for kind, pat in PATTERNS.items()}


def luhn_ok(digits: str) -> bool:
    """Luhn mod-10 checksum over a digits-only string (ISO/IEC 7812)."""
    if not digits:
        return False
    total = 0
    n = len(digits)
    for i, ch in enumerate(digits):
        d = ord(ch) - 48
        if (n - i - 1) % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def _digits(value: str) -> str:
    return re.sub(r"[^0-9]", "", value)


def is_valid(kind: str, value: str) -> bool:
    """The per-kind validity post-filter (detection side only)."""
    if kind == "email":
        return True
    if kind == "ipv4":
        return all(int(o) <= 255 for o in value.split("."))
    if kind == "phone":
        return 7 <= len(_digits(value)) <= 15
    if kind == "card":
        return luhn_ok(_digits(value))
    raise ValueError(f"unknown pii kind: {kind}")


def find_pii(text: str) -> list[tuple[str, int, int, str]]:
    """All VALID matches as (kind, start, end, value), sorted by
    (start, kind).  Kinds scan independently — a card number inside
    an email-free digit context may legitimately also report as a
    phone; downstream consumers key on kind."""
    out: list[tuple[str, int, int, str]] = []
    if not text:
        return out
    for kind, rx in _COMPILED.items():
        for m in rx.finditer(text):
            if is_valid(kind, m.group(0)):
                out.append((kind, m.start(), m.end(), m.group(0)))
    out.sort(key=lambda r: (r[1], r[0]))
    return out


def redact(text: str) -> str:
    """Recall-oriented masking: every raw regex candidate of every
    kind is replaced (validity ignored), in REDACT_ORDER."""
    if not text:
        return text
    for kind in REDACT_ORDER:
        text = _COMPILED[kind].sub(MASKS[kind], text)
    return text
