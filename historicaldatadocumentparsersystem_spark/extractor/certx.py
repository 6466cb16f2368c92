"""X.509 certificate reader — from-scratch DER/ASN.1, pure Python,
Spark-free.

A crawl sees TLS metadata everywhere (WARC ``certificate`` records,
``.well-known`` chains, CT-log exports); the security-posture family
(``sechdrx``) grades headers, this module grades the transport
credential itself. Parsing is a definite-length DER TLV walk — no
crypto library, no signature verification (we read structure, we do
not validate trust).

Deterministic subset (RFC 5280):
- TBSCertificate: version (default v1 = 0), serial (lowercase hex,
  no leading zero bytes beyond sign), signature AlgorithmIdentifier,
  issuer / subject RDNSequence (first-seen CN plus a canonical
  ``attr=value`` DN string in encoding order), validity (UTCTime
  sliding window per RFC 5280 4.1.2.5.1, GeneralizedTime verbatim)
  as ``YYYY-MM-DDTHH:MM:SSZ`` strings — string comparison orders
  them correctly so the Spark/DuckDB twins never parse dates;
- SubjectPublicKeyInfo: algorithm name, RSA modulus bit length /
  EC named curve / Ed25519;
- extensions: subjectAltName (dNSName + iPAddress v4), basic
  constraints CA flag, keyUsage named bits, extendedKeyUsage;
- ``self_signed`` = issuer and subject encode to identical DER
  (byte compare, not string compare).

The encode half (``der_*`` builders + ``build_certificate``) lives
here too so fixtures construct real DER that this parser must
round-trip; tests pin encode->decode equality.

Reference semantics anchor: the reference's extraction treats every
payload as bytes-in, structured-record-out (doc_processor.py's
format dispatch); certificates are one more opaque-binary column.
"""

from __future__ import annotations

import base64
import hashlib
import re

# ---------------------------------------------------------------
# OID tables (public, RFC 5280 / PKIX arc)

ATTR_OIDS = {
    "2.5.4.3": "CN", "2.5.4.6": "C", "2.5.4.7": "L",
    "2.5.4.8": "ST", "2.5.4.10": "O", "2.5.4.11": "OU",
    "1.2.840.113549.1.9.1": "emailAddress",
}

SIG_ALG_OIDS = {
    "1.2.840.113549.1.1.4": "md5WithRSAEncryption",
    "1.2.840.113549.1.1.5": "sha1WithRSAEncryption",
    "1.2.840.113549.1.1.11": "sha256WithRSAEncryption",
    "1.2.840.113549.1.1.12": "sha384WithRSAEncryption",
    "1.2.840.113549.1.1.13": "sha512WithRSAEncryption",
    "1.2.840.10045.4.3.2": "ecdsa-with-SHA256",
    "1.2.840.10045.4.3.3": "ecdsa-with-SHA384",
    "1.3.101.112": "ed25519",
}

KEY_ALG_OIDS = {
    "1.2.840.113549.1.1.1": "rsaEncryption",
    "1.2.840.10045.2.1": "ecPublicKey",
    "1.3.101.112": "ed25519",
}

CURVE_OIDS = {
    "1.2.840.10045.3.1.7": ("prime256v1", 256),
    "1.3.132.0.34": ("secp384r1", 384),
    "1.3.132.0.35": ("secp521r1", 521),
}

KEY_USAGE_BITS = [
    "digitalSignature", "nonRepudiation", "keyEncipherment",
    "dataEncipherment", "keyAgreement", "keyCertSign", "cRLSign",
    "encipherOnly", "decipherOnly",
]

EKU_OIDS = {
    "1.3.6.1.5.5.7.3.1": "serverAuth",
    "1.3.6.1.5.5.7.3.2": "clientAuth",
    "1.3.6.1.5.5.7.3.3": "codeSigning",
    "1.3.6.1.5.5.7.3.4": "emailProtection",
}

OID_SAN = "2.5.29.17"
OID_BASIC_CONSTRAINTS = "2.5.29.19"
OID_KEY_USAGE = "2.5.29.15"
OID_EKU = "2.5.29.37"


# ---------------------------------------------------------------
# DER decode

class DerError(ValueError):
    pass


def read_tlv(data: bytes, off: int):
    """One DER TLV at ``off`` -> (tag_byte, value, next_off).

    Definite lengths only (DER forbids indefinite); low-tag-number
    form only (certificates use no tag above 30)."""
    if off + 2 > len(data):
        raise DerError("truncated header")
    tag = data[off]
    if tag & 0x1F == 0x1F:
        raise DerError("high tag number unsupported")
    n = data[off + 1]
    off += 2
    if n & 0x80:
        k = n & 0x7F
        if k == 0 or k > 4 or off + k > len(data):
            raise DerError("bad long-form length")
        n = int.from_bytes(data[off:off + k], "big")
        off += k
    end = off + n
    if end > len(data):
        raise DerError("value overruns buffer")
    return tag, data[off:end], end


def iter_tlv(data: bytes):
    """Children of a constructed value, in order."""
    off = 0
    while off < len(data):
        tag, val, off = read_tlv(data, off)
        yield tag, val


def decode_oid(body: bytes) -> str:
    if not body:
        raise DerError("empty OID")
    first = body[0]
    out = [str(first // 40), str(first % 40)]
    acc = 0
    for b in body[1:]:
        acc = (acc << 7) | (b & 0x7F)
        if not b & 0x80:
            out.append(str(acc))
            acc = 0
    if body[-1] & 0x80:
        raise DerError("truncated OID arc")
    return ".".join(out)


def _decode_time(tag: int, body: bytes) -> str:
    s = body.decode("ascii", "replace")
    if tag == 0x17:  # UTCTime YYMMDDHHMMSSZ
        m = re.fullmatch(r"(\d{2})(\d{10})Z", s)
        if not m:
            raise DerError("bad UTCTime")
        yy = int(m.group(1))
        year = 2000 + yy if yy < 50 else 1900 + yy
        s = f"{year:04d}{m.group(2)}Z"
    elif tag != 0x18 or not re.fullmatch(r"\d{14}Z", s):
        raise DerError("bad time")
    return (f"{s[0:4]}-{s[4:6]}-{s[6:8]}T"
            f"{s[8:10]}:{s[10:12]}:{s[12:14]}Z")


def _decode_attr_value(tag: int, body: bytes) -> str:
    # PrintableString / UTF8String / IA5String all carry text
    return body.decode("utf-8", "replace")


def parse_name(der: bytes):
    """RDNSequence value bytes -> (dn_string, first-seen CN)."""
    parts, cn = [], None
    for set_tag, set_val in iter_tlv(der):
        if set_tag != 0x31:
            raise DerError("RDN is not a SET")
        for seq_tag, seq_val in iter_tlv(set_val):
            if seq_tag != 0x30:
                raise DerError("ATV is not a SEQUENCE")
            items = list(iter_tlv(seq_val))
            if len(items) != 2 or items[0][0] != 0x06:
                raise DerError("bad AttributeTypeAndValue")
            oid = decode_oid(items[0][1])
            val = _decode_attr_value(items[1][0], items[1][1])
            name = ATTR_OIDS.get(oid, oid)
            parts.append(f"{name}={val}")
            if name == "CN" and cn is None:
                cn = val
    return ",".join(parts), cn


def _parse_alg(der: bytes):
    """AlgorithmIdentifier value bytes -> (name-or-oid, params)."""
    items = list(iter_tlv(der))
    if not items or items[0][0] != 0x06:
        raise DerError("bad AlgorithmIdentifier")
    oid = decode_oid(items[0][1])
    params = items[1] if len(items) > 1 else None
    return oid, params


def _parse_spki(der: bytes):
    """SubjectPublicKeyInfo -> (alg_name, bits, curve-or-None)."""
    items = list(iter_tlv(der))
    if len(items) != 2 or items[0][0] != 0x30 or items[1][0] != 0x03:
        raise DerError("bad SubjectPublicKeyInfo")
    oid, params = _parse_alg(items[0][1])
    alg = KEY_ALG_OIDS.get(oid, oid)
    bitstr = items[1][1]
    if not bitstr:
        raise DerError("empty BIT STRING")
    key = bitstr[1:]  # skip unused-bits octet
    if alg == "rsaEncryption":
        kitems = list(iter_tlv(key))  # RSAPublicKey SEQUENCE
        if not kitems or kitems[0][0] != 0x30:
            raise DerError("bad RSAPublicKey")
        nitems = list(iter_tlv(kitems[0][1]))
        if not nitems or nitems[0][0] != 0x02:
            raise DerError("bad RSA modulus")
        mod = nitems[0][1].lstrip(b"\x00")
        return alg, len(mod) * 8 - (8 - mod[0].bit_length()
                                    if mod else 0), None
    if alg == "ecPublicKey":
        curve = None
        bits = None
        if params and params[0] == 0x06:
            curve, bits = CURVE_OIDS.get(
                decode_oid(params[1]), (decode_oid(params[1]), None))
        return alg, bits, curve
    if alg == "ed25519":
        return alg, 256, None
    return alg, None, None


def _parse_san(der: bytes):
    """GeneralNames -> (dns list, ip list)."""
    items = list(iter_tlv(der))
    if len(items) != 1 or items[0][0] != 0x30:
        raise DerError("bad SAN")
    dns, ips = [], []
    for tag, val in iter_tlv(items[0][1]):
        kind = tag & 0x1F
        if tag & 0xC0 != 0x80:
            continue  # only context-class GeneralName tags
        if kind == 2:  # dNSName, IA5String
            dns.append(val.decode("ascii", "replace"))
        elif kind == 7 and len(val) == 4:  # iPAddress v4
            ips.append(".".join(str(b) for b in val))
        elif kind == 7 and len(val) == 16:  # v6, lowercase hex
            ips.append(":".join(val[i:i + 2].hex()
                                for i in range(0, 16, 2)))
    return dns, ips


def _parse_extensions(der: bytes, out: dict) -> None:
    for tag, val in iter_tlv(der):
        if tag != 0x30:
            continue
        items = list(iter_tlv(val))
        if not items or items[0][0] != 0x06:
            continue
        oid = decode_oid(items[0][1])
        rest = items[1:]
        # optional critical BOOLEAN before the value OCTET STRING
        if rest and rest[0][0] == 0x01:
            rest = rest[1:]
        if not rest or rest[0][0] != 0x04:
            continue
        body = rest[0][1]
        if oid == OID_SAN:
            out["san_dns"], out["san_ip"] = _parse_san(body)
        elif oid == OID_BASIC_CONSTRAINTS:
            bitems = list(iter_tlv(body))
            if bitems and bitems[0][0] == 0x30:
                inner = list(iter_tlv(bitems[0][1]))
                out["is_ca"] = bool(
                    inner and inner[0][0] == 0x01
                    and inner[0][1] and inner[0][1][0])
        elif oid == OID_KEY_USAGE:
            bitems = list(iter_tlv(body))
            if bitems and bitems[0][0] == 0x03 and len(bitems[0][1]) >= 2:
                bits = int.from_bytes(bitems[0][1][1:], "big")
                width = (len(bitems[0][1]) - 1) * 8
                out["key_usage"] = [
                    n for i, n in enumerate(KEY_USAGE_BITS)
                    if width > i and bits >> (width - 1 - i) & 1]
        elif oid == OID_EKU:
            bitems = list(iter_tlv(body))
            if bitems and bitems[0][0] == 0x30:
                out["ext_key_usage"] = [
                    EKU_OIDS.get(decode_oid(v), decode_oid(v))
                    for t, v in iter_tlv(bitems[0][1]) if t == 0x06]


def parse_certificate(der: bytes) -> dict:
    """One DER certificate -> flat field dict.

    Raises ``DerError`` (a ValueError) on any structural defect —
    callers that want null-row degradation catch it."""
    if not isinstance(der, (bytes, bytearray)) or not der:
        raise DerError("empty input")
    der = bytes(der)
    tag, cert_val, end = read_tlv(der, 0)
    if tag != 0x30 or end != len(der):
        raise DerError("not a single SEQUENCE")
    top = list(iter_tlv(cert_val))
    if len(top) != 3 or top[0][0] != 0x30:
        raise DerError("not a Certificate")
    tbs = list(iter_tlv(top[0][1]))
    if len(tbs) < 6:
        raise DerError("short TBSCertificate")
    i = 0
    version = 0
    if tbs[0][0] == 0xA0:  # [0] EXPLICIT version
        vitems = list(iter_tlv(tbs[0][1]))
        if vitems and vitems[0][0] == 0x02 and vitems[0][1]:
            version = vitems[0][1][-1]
        i = 1
    if tbs[i][0] != 0x02:
        raise DerError("bad serial")
    serial = (tbs[i][1].lstrip(b"\x00") or b"\x00").hex()
    sig_oid, _ = _parse_alg(tbs[i + 1][1])
    issuer_raw = tbs[i + 2][1]
    validity = list(iter_tlv(tbs[i + 3][1]))
    if len(validity) != 2:
        raise DerError("bad Validity")
    not_before = _decode_time(*validity[0])
    not_after = _decode_time(*validity[1])
    subject_raw = tbs[i + 4][1]
    key_alg, key_bits, curve = _parse_spki(tbs[i + 5][1])
    out = {
        "version": version + 1,
        "serial": serial,
        "sig_alg": SIG_ALG_OIDS.get(sig_oid, sig_oid),
        "issuer_dn": None, "issuer_cn": None,
        "subject_dn": None, "subject_cn": None,
        "not_before": not_before, "not_after": not_after,
        "pubkey_alg": key_alg, "pubkey_bits": key_bits,
        "curve": curve,
        "san_dns": [], "san_ip": [],
        "is_ca": False, "key_usage": [], "ext_key_usage": [],
        "self_signed": issuer_raw == subject_raw,
        "fingerprint_sha256": hashlib.sha256(der).hexdigest(),
    }
    out["issuer_dn"], out["issuer_cn"] = parse_name(issuer_raw)
    out["subject_dn"], out["subject_cn"] = parse_name(subject_raw)
    for j in range(i + 6, len(tbs)):
        if tbs[j][0] == 0xA3:  # [3] EXPLICIT extensions
            eitems = list(iter_tlv(tbs[j][1]))
            if eitems and eitems[0][0] == 0x30:
                _parse_extensions(eitems[0][1], out)
    return out


_PEM_RE = re.compile(
    r"-----BEGIN CERTIFICATE-----(.*?)-----END CERTIFICATE-----",
    re.S)


def pem_to_ders(text) -> list:
    """PEM text/bytes -> list of DER blobs, armor order preserved.
    Blocks whose base64 fails to decode are skipped."""
    if isinstance(text, (bytes, bytearray)):
        text = bytes(text).decode("utf-8", "replace")
    if not isinstance(text, str):
        return []
    out = []
    for m in _PEM_RE.finditer(text):
        try:
            out.append(base64.b64decode(
                re.sub(r"\s+", "", m.group(1)), validate=True))
        except Exception:
            continue
    return out


def extract_chain(payload) -> list:
    """PEM or single-DER payload -> [field dict per cert], bad
    certs skipped. The degradation path for the Spark reader."""
    if payload is None:
        return []
    if isinstance(payload, str):
        payload = payload.encode("utf-8", "replace")
    payload = bytes(payload)
    ders = (pem_to_ders(payload)
            if b"-----BEGIN CERTIFICATE-----" in payload
            else [payload])
    out = []
    for der in ders:
        try:
            out.append(parse_certificate(der))
        except (DerError, ValueError):
            continue
    return out


# ---------------------------------------------------------------
# DER encode — the fixture half; tests pin encode->decode identity

def der_tlv(tag: int, body: bytes) -> bytes:
    n = len(body)
    if n < 0x80:
        return bytes([tag, n]) + body
    ln = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([tag, 0x80 | len(ln)]) + ln + body


def der_seq(*parts: bytes) -> bytes:
    return der_tlv(0x30, b"".join(parts))


def der_oid(dotted: str) -> bytes:
    arcs = [int(x) for x in dotted.split(".")]
    body = bytearray([arcs[0] * 40 + arcs[1]])
    for a in arcs[2:]:
        chunk = bytearray([a & 0x7F])
        a >>= 7
        while a:
            chunk.append(0x80 | (a & 0x7F))
            a >>= 7
        body.extend(reversed(chunk))
    return der_tlv(0x06, bytes(body))


def der_utctime(iso: str) -> bytes:
    # "YYYY-MM-DDTHH:MM:SSZ" -> UTCTime
    s = iso.replace("-", "").replace(":", "").replace("T", "")
    return der_tlv(0x17, (s[2:]).encode("ascii"))


def der_gentime(iso: str) -> bytes:
    s = iso.replace("-", "").replace(":", "").replace("T", "")
    return der_tlv(0x18, s.encode("ascii"))


def der_name(attrs) -> bytes:
    """[(short-name-or-oid, value), ...] -> RDNSequence (one ATV
    per RDN, encoding order = list order)."""
    rev = {v: k for k, v in ATTR_OIDS.items()}
    rdns = []
    for name, val in attrs:
        oid = rev.get(name, name)
        atv = der_seq(der_oid(oid),
                      der_tlv(0x0C, val.encode("utf-8")))
        rdns.append(der_tlv(0x31, atv))
    return der_seq(*rdns)


def der_int(value) -> bytes:
    if isinstance(value, int):
        n = max(1, (value.bit_length() + 8) // 8)
        return der_tlv(0x02, value.to_bytes(n, "big"))
    return der_tlv(0x02, value)  # raw bytes (e.g. RSA modulus)


def build_spki(alg: str, *, modulus: bytes = b"",
               curve: str = "prime256v1") -> bytes:
    if alg == "rsa":
        if modulus and modulus[0] & 0x80:
            modulus = b"\x00" + modulus  # DER positive INTEGER
        pub = der_seq(der_int(modulus), der_int(65537))
        return der_seq(
            der_seq(der_oid("1.2.840.113549.1.1.1"), der_tlv(0x05, b"")),
            der_tlv(0x03, b"\x00" + pub))
    if alg == "ec":
        rev = {v[0]: k for k, v in CURVE_OIDS.items()}
        return der_seq(
            der_seq(der_oid("1.2.840.10045.2.1"),
                    der_oid(rev[curve])),
            der_tlv(0x03, b"\x00\x04" + b"\x11" * 64))
    if alg == "ed25519":
        return der_seq(der_seq(der_oid("1.3.101.112")),
                       der_tlv(0x03, b"\x00" + b"\x22" * 32))
    raise ValueError(alg)


def build_certificate(*, serial: int, sig_oid: str,
                      issuer, subject,
                      not_before: str, not_after: str,
                      spki: bytes,
                      san_dns=(), san_ip=(),
                      is_ca=None, key_usage=(),
                      eku=(), gen_time=False) -> bytes:
    """Assemble a v3 (or v1 when no extensions) DER certificate with
    a deterministic dummy signature. ``issuer``/``subject`` are
    attr lists for ``der_name`` or raw RDNSequence bytes."""
    issuer_b = issuer if isinstance(issuer, bytes) else der_name(issuer)
    subject_b = (subject if isinstance(subject, bytes)
                 else der_name(subject))
    t = der_gentime if gen_time else der_utctime
    exts = []
    if san_dns or san_ip:
        names = b"".join(
            [der_tlv(0x82, d.encode("ascii")) for d in san_dns]
            + [der_tlv(0x87, bytes(int(x) for x in ip.split(".")))
               for ip in san_ip])
        exts.append(der_seq(der_oid(OID_SAN),
                            der_tlv(0x04, der_seq(names))))
    if is_ca is not None:
        bc = der_seq(der_tlv(0x01, b"\xff" if is_ca else b"\x00"))
        exts.append(der_seq(der_oid(OID_BASIC_CONSTRAINTS),
                            der_tlv(0x01, b"\xff"),
                            der_tlv(0x04, bc)))
    if key_usage:
        # first 8 named bits only (decipherOnly would need a 2nd
        # octet); DER: unused-bits octet = trailing zero count
        byte = 0
        for name in key_usage:
            idx = KEY_USAGE_BITS.index(name)
            if idx > 7:
                raise ValueError("fixture encoder: bit > 7")
            byte |= 1 << (7 - idx)
        unused = (byte & -byte).bit_length() - 1 if byte else 0
        exts.append(der_seq(
            der_oid(OID_KEY_USAGE),
            der_tlv(0x04, der_tlv(0x03, bytes([unused, byte])))))
    if eku:
        rev = {v: k for k, v in EKU_OIDS.items()}
        body = der_seq(*[der_oid(rev.get(e, e)) for e in eku])
        exts.append(der_seq(der_oid(OID_EKU), der_tlv(0x04, body)))
    tbs_parts = []
    if exts:
        tbs_parts.append(der_tlv(0xA0, der_int(2)))  # v3
    tbs_parts += [
        der_int(serial),
        der_seq(der_oid(sig_oid), der_tlv(0x05, b"")),
        issuer_b,
        der_seq(t(not_before), t(not_after)),
        subject_b,
        spki,
    ]
    if exts:
        tbs_parts.append(der_tlv(0xA3, der_seq(*exts)))
    tbs = der_seq(*tbs_parts)
    sig = hashlib.sha256(tbs).digest()  # deterministic dummy
    return der_seq(tbs,
                   der_seq(der_oid(sig_oid), der_tlv(0x05, b"")),
                   der_tlv(0x03, b"\x00" + sig))


def to_pem(der: bytes) -> str:
    b64 = base64.b64encode(der).decode("ascii")
    lines = [b64[i:i + 64] for i in range(0, len(b64), 64)]
    return ("-----BEGIN CERTIFICATE-----\n"
            + "\n".join(lines)
            + "\n-----END CERTIFICATE-----\n")
