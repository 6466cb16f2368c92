"""JWT family: encode/parse round-trip, gates, HMAC vector,
Spark==pure parity on samples + adversarial tokens."""

import base64
import hashlib
import hmac
import random

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import jwtx


def test_roundtrip_and_signature():
    tok = jwtx.build_jwt({"alg": "HS256", "typ": "JWT"},
                         {"sub": "alice", "exp": 2000000000})
    r = dict(zip(jwtx.FIELDS, jwtx.parse_jwt(tok)))
    assert r["well_formed"] and r["alg"] == "HS256"
    assert r["sub"] == "alice" and r["exp"] == 2000000000
    assert r["expired"] is False and r["n_claims"] == 2
    # the signature is a real HS256 over the signing input
    signing, sig_b64 = tok.rsplit(".", 1)
    pad = "=" * ((4 - len(sig_b64) % 4) % 4)
    want = hmac.new(b"fixture-key", signing.encode(),
                    hashlib.sha256).digest()
    assert base64.urlsafe_b64decode(sig_b64 + pad) == want
    assert r["sig_chars"] == len(sig_b64) == 43


def test_gates_and_boundaries():
    p = jwtx.parse_jwt
    f = dict(zip(jwtx.FIELDS, p(jwtx.build_jwt(
        {"alg": "HS256"}, {"exp": jwtx.JWT_AS_OF}))))
    assert f["expired"] is False            # not strictly less
    f = dict(zip(jwtx.FIELDS, p(jwtx.build_jwt(
        {"alg": "HS256"}, {"exp": jwtx.JWT_AS_OF - 1}))))
    assert f["expired"] is True
    # digits gate: float / negative / bool / 20-digit
    for bad in (1.5, -5, True, 10 ** 19):
        f = dict(zip(jwtx.FIELDS, p(jwtx.build_jwt(
            {"alg": "HS256"}, {"exp": bad}))))
        assert f["exp"] is None and f["expired"] is None, bad
    # structure failures
    for t in ("a.b", "a.b.c.d", "", "abc+/.def.ghi",
              "abcde.defg.hijk", "bm90IGpzb24.e30.x"):
        assert p(t)[0] is False, t
    assert p(None)[0] is None
    # unsecured form: empty trailing signature is well-formed
    assert p("eyJhbGciOiJub25lIn0.e30.")[:2] == (True, "none")


def test_spark_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark.operators import \
        jwtops
    rng = random.Random(41)
    toks = list(fixtures.jwt_sample_rows())
    alpha = ("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
             "0123456789-_")
    for _ in range(120):
        n = rng.randrange(0, 5)
        toks.append(".".join(
            "".join(rng.choice(alpha)
                    for _ in range(rng.randrange(0, 30)))
            for _ in range(n)))
    # crafted valid-object payloads through random junk headers
    for _ in range(30):
        pay = base64.urlsafe_b64encode(
            b'{"sub":"x","exp":1800000000}').rstrip(b"=").decode()
        hdr = "".join(rng.choice(alpha)
                      for _ in range(rng.choice([3, 4, 8])))
        toks.append(f"{hdr}.{pay}.sig")
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)],
        "pos int, token string").repartition(8)
    got = {r["pos"]: tuple(r[f] for f in jwtx.FIELDS)
           for r in jwtops.parse_jwt_df(df).collect()}
    for i, t in enumerate(toks):
        assert got[i] == jwtx.parse_jwt(t), (i, t)
