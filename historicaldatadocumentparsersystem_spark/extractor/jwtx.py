"""JWT (JSON Web Token) STRUCTURE reader — pure Python, from
scratch, Spark-free. Parsing only: no verification, no key
material — the log-analytics view of tokens that leak into URLs,
Authorization headers, and HAR captures (the privacy sibling of
``cookiex``/``sechdrx``).

Grammar (RFC 7519 compact serialization), kept deliberately
SQL-replicable so the Spark side and the DuckDB twin re-derive
every field from the raw string:

- exactly three '.'-separated parts (the unsecured form keeps a
  trailing empty signature);
- header/payload must be NON-EMPTY base64url (``^[A-Za-z0-9_-]+$``)
  with ``length % 4 != 1`` (no base64 length decodes from 4k+1
  chars); decoding pads with '=' and translates ``-_`` -> ``+/``;
- both must decode to JSON objects (duplicate keys are undefined
  across engines — the fixture corpus avoids them);
- numeric claims (exp/iat) are taken ONLY when their JSON string
  form is 1-18 plain digits: DuckDB try_cast ROUNDS '1700.5' while
  Spark NULLs it, so floats/negatives are excluded by the shared
  gate everywhere;
- ``expired`` compares exp against the fixed :data:`JWT_AS_OF`
  instant (the certs.CERT_AS_OF discipline).

``build_jwt`` is the encode half (HMAC-SHA256 via stdlib) — fixture
tokens must round-trip through the parser.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import re

B64URL_RE = r"^[A-Za-z0-9_-]+$"
DIGITS_RE = r"^[0-9]{1,18}$"
# 2026-01-01T00:00:00Z — fixtures are built around it
JWT_AS_OF = 1767225600

_B64 = re.compile(B64URL_RE)
_DIG = re.compile(DIGITS_RE)

FIELDS = ("well_formed", "alg", "typ", "kid", "iss", "sub",
          "exp", "iat", "expired", "n_claims", "sig_chars")


def _b64url_decode(part: str) -> bytes | None:
    if not _B64.match(part) or len(part) % 4 == 1:
        return None
    pad = (4 - len(part) % 4) % 4
    try:
        return base64.b64decode(
            part.translate(str.maketrans("-_", "+/")) + "=" * pad)
    except ValueError:
        return None


def _json_obj(raw: bytes | None) -> dict | None:
    if raw is None:
        return None
    try:
        # lenient decode (U+FFFD), matching Spark's binary->string
        # cast; the DuckDB twin's strict decode() only ever sees the
        # valid-UTF-8 fixture corpus behind its CASE guard
        obj = json.loads(raw.decode("utf-8", "replace"))
    except (ValueError, RecursionError):
        return None
    return obj if isinstance(obj, dict) else None


def _num_claim(obj: dict, key: str) -> int | None:
    v = obj.get(key)
    if isinstance(v, bool) or not isinstance(v, int):
        return None
    return v if _DIG.match(str(v)) else None


def _str_claim(obj: dict, key: str) -> str | None:
    v = obj.get(key)
    return v if isinstance(v, str) else None


def parse_jwt(token) -> tuple:
    """token -> FIELDS tuple; (False, None, ...) when malformed,
    all-None for a None input. Never raises."""
    if token is None:
        return (None,) * len(FIELDS)
    bad = (False,) + (None,) * (len(FIELDS) - 1)
    parts = str(token).split(".")
    if len(parts) != 3:
        return bad
    hdr = _json_obj(_b64url_decode(parts[0]))
    pay = _json_obj(_b64url_decode(parts[1]))
    sig = parts[2]
    if hdr is None or pay is None \
            or (sig and (not _B64.match(sig) or len(sig) % 4 == 1)):
        return bad
    exp = _num_claim(pay, "exp")
    return (True, _str_claim(hdr, "alg"), _str_claim(hdr, "typ"),
            _str_claim(hdr, "kid"), _str_claim(pay, "iss"),
            _str_claim(pay, "sub"), exp, _num_claim(pay, "iat"),
            None if exp is None else exp < JWT_AS_OF,
            len(pay), len(sig))


def build_jwt(header: dict, payload: dict,
              key: bytes = b"fixture-key") -> str:
    """Encode half: compact HS256 JWS (deterministic — sorted keys,
    compact separators). Must round-trip through parse_jwt."""
    def enc(obj: dict) -> str:
        raw = json.dumps(obj, sort_keys=True,
                         separators=(",", ":")).encode("utf-8")
        return base64.urlsafe_b64encode(raw).rstrip(b"=").decode()

    signing = f"{enc(header)}.{enc(payload)}"
    sig = hmac.new(key, signing.encode("ascii"),
                   hashlib.sha256).digest()
    return signing + "." + \
        base64.urlsafe_b64encode(sig).rstrip(b"=").decode()
