"""TLS certificate hygiene over the certx reader's flat rows.

The transport-layer sibling of ``operators/sechdr.py`` (header
posture): given one row per certificate (``sources.read_certificates``
or the committed golden), grade each host's served credential and
audit chain linkage. All timestamps are ``YYYY-MM-DDTHH:MM:SSZ``
strings, so validity checks are plain string comparisons in BOTH
engines — no date parsing anywhere near the driver hash.

Scale: every op here is a narrow projection or a (url)-keyed
self-join/groupBy over cert METADATA rows (hundreds of bytes each,
~1 row per host) — at 100 TB of page payloads the cert table is
orders of magnitude smaller and one shuffle on url is the floor.

Grade ladder (first match wins):
  F  expired or not yet valid at the as-of instant
  D  self-signed, or SANs present but none covers the url host
     (exact or single-label wildcard match, RFC 6125 subset)
  C  weak signature (md5/sha1 RSA) or RSA modulus < 2048 bits
  B  no SAN at all (legacy CN-only certificate)
  A  none of the above
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the fixed "now" both engines judge validity against (fixtures are
# built around it; generated into the DuckDB twin, never retyped)
CERT_AS_OF = "2026-01-01T00:00:00Z"
WEAK_SIG_ALGS = ("md5WithRSAEncryption", "sha1WithRSAEncryption")
MIN_RSA_BITS = 2048


def covered_sql(san: str, host: str) -> str:
    """Engine-portable boolean: does SAN dNSName ``san`` cover
    ``host``? Exact match, or a ``*.`` wildcard covering exactly one
    extra label (the RFC 6125 browser rule). Only substr/length/
    instr — identical text runs in Spark SQL and DuckDB."""
    sfx_len = f"(length({san}) - 1)"
    pre_len = f"(length({host}) - {sfx_len})"
    return (
        f"({san} = {host} OR ("
        f"substr({san}, 1, 2) = '*.' "
        f"AND length({host}) > {sfx_len} "
        f"AND substr({host}, {pre_len} + 1) = substr({san}, 2) "
        f"AND instr(substr({host}, 1, {pre_len}), '.') = 0))")


def weak_sql(sig_alg: str = "sig_alg", pubkey_alg: str = "pubkey_alg",
             bits: str = "pubkey_bits") -> str:
    """Engine-portable weak-crypto predicate, generated from the
    module constants."""
    algs = ", ".join(f"'{a}'" for a in WEAK_SIG_ALGS)
    return (f"({sig_alg} IN ({algs}) OR ({pubkey_alg} = "
            f"'rsaEncryption' AND {bits} < {MIN_RSA_BITS}))")


def cert_hygiene(certs: DataFrame,
                 as_of: str = CERT_AS_OF) -> DataFrame:
    """Leaf-certificate grade per url. Input: read_certificates rows.
    Map-only (filter chain_pos = 0 + projection) — zero shuffles."""
    # strip an explicit :port — SAN coverage is host-only (a
    # https://example.com:8443/ url must not auto-grade D)
    host = "split(split(split(url, '://')[1], '/')[0], ':')[0]"
    covered = f"exists(san_dns, s -> {covered_sql('s', 'host')})"
    return (certs.where(F.col("chain_pos") == 0)
            .withColumn("host", F.expr(host))
            .withColumn("expired",
                        F.col("not_after") < F.lit(as_of))
            .withColumn("not_yet_valid",
                        F.col("not_before") > F.lit(as_of))
            .withColumn("no_san",
                        (F.size("san_dns") == 0)
                        & (F.size("san_ip") == 0))
            .withColumn("host_covered", F.expr(covered))
            .withColumn("san_mismatch",
                        (F.size("san_dns") > 0)
                        & ~F.col("host_covered"))
            .withColumn("weak_crypto", F.expr(weak_sql()))
            .withColumn(
                "grade",
                F.when(F.col("expired") | F.col("not_yet_valid"),
                       "F")
                .when(F.col("self_signed") | F.col("san_mismatch"),
                      "D")
                .when(F.col("weak_crypto"), "C")
                .when(F.col("no_san"), "B")
                .otherwise("A"))
            .select("url", "host", "subject_cn", "sig_alg",
                    "pubkey_alg", "pubkey_bits", "not_after",
                    "expired", "not_yet_valid", "self_signed",
                    "no_san", "host_covered", "san_mismatch",
                    "weak_crypto", "grade"))


def chain_integrity(certs: DataFrame) -> DataFrame:
    """Per-url chain audit: is every adjacent (child, parent) pair
    DN-linked, and does the chain top out at a self-signed root?
    Two url-keyed hash aggregations + one url equi-join — the url
    key is reused, no wide shuffle."""
    per_url = (certs.groupBy("url")
               .agg(F.count(F.lit(1)).cast("long").alias("n_certs"),
                    F.max_by("self_signed", "chain_pos")
                    .alias("top_self_signed")))
    child = certs.select("url",
                         F.col("chain_pos").alias("cpos"),
                         F.col("issuer_dn").alias("c_issuer"))
    parent = certs.select("url",
                          F.col("chain_pos").alias("ppos"),
                          F.col("subject_dn").alias("p_subject"))
    pairs = (child.join(parent,
                        (child.url == parent.url)
                        & (parent.ppos == child.cpos + 1))
             .select(child.url.alias("url"),
                     (F.col("c_issuer") == F.col("p_subject"))
                     .alias("linked")))
    linked = (pairs.groupBy("url")
              .agg(F.bool_and("linked").alias("chain_linked")))
    return (per_url.join(linked, "url", "left")
            .select("url", "n_certs",
                    F.coalesce("chain_linked", F.lit(True))
                    .alias("chain_linked"),
                    "top_self_signed")
            .orderBy("url"))


def crypto_profile(certs: DataFrame) -> DataFrame:
    """Corpus rollup: certificate count and weak share per
    (sig_alg, pubkey_alg). One map-side-combinable groupBy."""
    return (certs
            .withColumn("weak", F.expr(weak_sql()))
            .groupBy("sig_alg", "pubkey_alg")
            .agg(F.count(F.lit(1)).cast("long").alias("n_certs"),
                 F.sum(F.col("weak").cast("long")).cast("long")
                 .alias("n_weak"),
                 F.countDistinct("url").cast("long")
                 .alias("n_hosts"))
            .orderBy("sig_alg", "pubkey_alg"))
