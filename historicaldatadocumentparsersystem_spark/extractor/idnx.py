"""Internationalized domain names — RFC 3492 punycode codec +
homograph profiling (Spark-free, pure Python).

Phishing corpora and link-spam demotion need the UNICODE form of a
host: ``xn--pypal-4ve.com`` renders as ``pаypal.com`` (Cyrillic а)
and only the decoded form exposes the mixed-script homograph. At
100 TB the distinct-host table is ~10^8 rows — a map-only decode over
it is trivial next to the payload pass, and the gate joins back to
the link graph on the host key.

The codec is from scratch (RFC 3492 §6.1-6.4: base 36, tmin 1,
tmax 26, skew 38, damp 700, initial bias 72, initial n 128) and
pinned bidirectionally against Python's stdlib ``punycode`` codec in
tests — an independent implementation of the same public spec.

Determinism contract:
- ``punycode_decode`` takes the part AFTER ``xn--``, lowercased
  input expected (callers lower the whole host first — IDNA hosts
  are case-insensitive); returns None on any violation: non-ASCII
  input, a non-alphanumeric extended digit, truncated digit runs,
  or a codepoint above U+10FFFF (the overflow guard);
- ``idn_to_unicode`` lowercases the host, splits on '.', decodes
  ``xn--`` labels; a label that fails decoding stays in its ASCII
  form and flips ``decode_ok`` to False;
- ``label_scripts`` returns the DISTINCT major scripts present in a
  label in SCRIPT_RANGES declaration order (the shared public
  Unicode block table in extractor/scriptranges.py);
- ``host_profile`` emits (host, unicode_host, is_idn, decode_ok,
  n_idn_labels, scripts, mixed_label): ``scripts`` is the
  ','-joined union across labels (declaration order; '' when no
  letter-bearing script is present — all-digit hosts), and
  ``mixed_label`` is True when ANY SINGLE label carries two or more
  scripts — the UTS #39 single-label mixing signal that defines the
  classic homograph. Pure-ASCII hosts profile as latin (or '' for
  all-digit labels) with every flag False.
"""
from __future__ import annotations

_BASE, _TMIN, _TMAX = 36, 1, 26
_SKEW, _DAMP, _INITIAL_BIAS, _INITIAL_N = 38, 700, 72, 128


def _adapt(delta: int, numpoints: int, firsttime: bool) -> int:
    delta = delta // _DAMP if firsttime else delta // 2
    delta += delta // numpoints
    k = 0
    while delta > ((_BASE - _TMIN) * _TMAX) // 2:
        delta //= _BASE - _TMIN
        k += _BASE
    return k + (_BASE - _TMIN + 1) * delta // (delta + _SKEW)


def _digit_value(ch: str) -> int | None:
    if "a" <= ch <= "z":
        return ord(ch) - 0x61
    if "0" <= ch <= "9":
        return ord(ch) - 0x30 + 26
    return None


def _digit_char(d: int) -> str:
    return chr(d + 0x61) if d < 26 else chr(d - 26 + 0x30)


def punycode_decode(s: str) -> str | None:
    """RFC 3492 §6.2. Input is the label part after 'xn--',
    already lowercased. None on malformed input."""
    if not s.isascii():
        return None
    pos = s.rfind("-")
    if pos >= 0:
        out = list(s[:pos])
        ext = s[pos + 1:]
    else:
        out, ext = [], s
    if any(ord(c) >= _INITIAL_N for c in out):
        return None
    n, i, bias = _INITIAL_N, 0, _INITIAL_BIAS
    p = 0
    while p < len(ext):
        oldi, w, k = i, 1, _BASE
        while True:
            if p >= len(ext):
                return None                   # truncated digit run
            digit = _digit_value(ext[p])
            p += 1
            if digit is None:
                return None
            i += digit * w
            t = min(max(k - bias, _TMIN), _TMAX)
            if digit < t:
                break
            w *= _BASE - t
            k += _BASE
        bias = _adapt(i - oldi, len(out) + 1, oldi == 0)
        n += i // (len(out) + 1)
        i %= len(out) + 1
        if n > 0x10FFFF:
            return None                       # overflow guard
        out.insert(i, chr(n))
        i += 1
    return "".join(out)


def punycode_encode(label: str) -> str:
    """RFC 3492 §6.3 — the encode half (fixture builders; round-trip
    pinned against decode and the stdlib codec)."""
    out = [c for c in label if ord(c) < _INITIAL_N]
    basic_len = h = len(out)
    if basic_len:
        out.append("-")
    n, delta, bias = _INITIAL_N, 0, _INITIAL_BIAS
    while h < len(label):
        m = min(ord(c) for c in label if ord(c) >= n)
        delta += (m - n) * (h + 1)
        n = m
        for c in label:
            cp = ord(c)
            if cp < n:
                delta += 1
            elif cp == n:
                q, k = delta, _BASE
                while True:
                    t = min(max(k - bias, _TMIN), _TMAX)
                    if q < t:
                        break
                    out.append(_digit_char(t + (q - t) % (_BASE - t)))
                    q = (q - t) // (_BASE - t)
                    k += _BASE
                out.append(_digit_char(q))
                bias = _adapt(delta, h + 1, h == basic_len)
                delta, h = 0, h + 1
        delta += 1
        n += 1
    return "".join(out)


def idn_to_unicode(host: str) -> tuple[str, bool, bool]:
    """(unicode_host, is_idn, decode_ok) — see module contract.
    Failed labels stay in ASCII form; decode_ok is True only when the
    host IS an IDN and every xn-- label decoded."""
    is_idn, ok = False, True
    labels = []
    for label in (host or "").lower().split("."):
        if label.startswith("xn--"):
            is_idn = True
            dec = punycode_decode(label[4:])
            if dec is None:
                labels.append(label)
                ok = False
            else:
                labels.append(dec)
        else:
            labels.append(label)
    return ".".join(labels), is_idn, is_idn and ok


def label_scripts(label: str) -> list[str]:
    """Distinct major scripts present, SCRIPT_RANGES order."""
    from .scriptranges import SCRIPT_RANGES
    found = []
    for name, ranges in SCRIPT_RANGES:
        if any(any(lo <= ord(c) <= hi for lo, hi in ranges)
               for c in label):
            found.append(name)
    return found


def host_profile(host: str) -> tuple:
    """(host_lower, unicode_host, is_idn, decode_ok, n_idn_labels,
    scripts_csv, mixed_label) — see module contract."""
    lower = (host or "").lower()
    uni, is_idn, decode_ok = idn_to_unicode(lower)
    n_idn = sum(1 for lb in lower.split(".")
                if lb.startswith("xn--"))
    mixed = False
    seen: list[str] = []
    for dec in uni.split("."):
        scripts = label_scripts(dec)
        if len(scripts) >= 2:
            mixed = True
        for s in scripts:
            if s not in seen:
                seen.append(s)
    from .scriptranges import SCRIPT_RANGES
    order = [name for name, _ in SCRIPT_RANGES]
    seen.sort(key=order.index)
    return (lower, uni, is_idn, decode_ok, n_idn,
            ",".join(seen), mixed)
