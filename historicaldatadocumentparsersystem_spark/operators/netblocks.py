"""CIDR longest-prefix-match lookup — the routing-table join that
maps log/remote IPs to their announcing network (ASN / org).

This is the canonical INTERVAL JOIN done the scale-safe way (the
bbox grid-bin pattern, operators/spans.py): every block is exploded
to the /8 buckets it covers (a prefix >= 8 lands in exactly ONE
bucket; a rare short prefix fans out to at most 256), the probe
side computes its single bucket, and the match is a bucket
EQUI-join plus a range predicate — never a cartesian or a
BroadcastNestedLoopJoin. Longest prefix wins via one window.

All of it is JVM builtins (regexp_extract + integer arithmetic in
whole-stage codegen); the DuckDB twin in ``__spark_entry__`` runs
the SAME formulas generated from the SAME constants
(``extractor/ipx.py`` — whose pure parsers are pinned against
stdlib ``ipaddress``).

Scale notes: routing/geo tables are ~1-5 M rows (tens of MB) —
broadcast the exploded block table; the probe side dedups to
DISTINCT addresses first (distinct remotes are orders of magnitude
fewer than log rows), so the only shuffle is the distinct, and the
LPM window reuses its hash partitioning (one exchange total).

Reference anchor: no network analytics in the reference
(doc_processor.py models the fetch side only) — crawl-ecosystem
extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..extractor.ipx import IPV4_RE

# /8 bucket width — 2^24 addresses per bucket
BUCKET = 16777216


def ipv4_int(col: Column) -> Column:
    """Strict dotted-quad -> bigint in [0, 2^32), NULL otherwise.
    Same formula the DuckDB twin runs (generated from IPV4_RE)."""
    oct_ = [F.regexp_extract(col, IPV4_RE, i).try_cast("long")
            for i in (1, 2, 3, 4)]
    val = (oct_[0] * 16777216 + oct_[1] * 65536
           + oct_[2] * 256 + oct_[3])
    return F.when(F.regexp_extract(col, IPV4_RE, 1) != "", val)


def parse_cidr_blocks(blocks: DataFrame,
                      cidr_col: str = "cidr") -> DataFrame:
    """(cidr, ...) -> + (prefix int, ip_start, ip_end bigint), host
    bits FLOORED; rows whose cidr fails strict validation (bad
    address, prefix outside 0..32) are dropped. A bare address is a
    /32 host block."""
    parts = F.split(F.col(cidr_col), "/")
    addr = parts[0]
    pfx_raw = F.when(F.size(parts) == 1, F.lit("32")).when(
        F.size(parts) == 2, parts[1])
    out = (blocks
           .withColumn("__ip", ipv4_int(addr))
           .withColumn("prefix", pfx_raw.try_cast("int"))
           .where(F.col("__ip").isNotNull()
                  & F.col("prefix").between(0, 32))
           .withColumn("__size", F.expr(
               "shiftleft(cast(1 as bigint), 32 - prefix)"))
           .withColumn("ip_start",
                       F.col("__ip") - F.col("__ip") % F.col("__size"))
           .withColumn("ip_end",
                       F.col("ip_start") + F.col("__size") - 1)
           .drop("__ip", "__size"))
    return out


def ip_lookup(df: DataFrame, blocks: DataFrame,
              ip_col: str = "remote") -> DataFrame:
    """Longest-prefix-match mapping: one row per DISTINCT ``ip_col``
    value in ``df`` -> (ip_num, prefix, cidr, asn, org), all NULL
    when the address doesn't parse or no block covers it.

    ``blocks`` is raw (cidr, asn, org); it is parsed, exploded to
    /8 buckets, and BROADCAST. Ties at equal prefix break on
    (asn, cidr) so the result is deterministic."""
    parsed = parse_cidr_blocks(blocks)
    exploded = (parsed.withColumn(
        "__bucket",
        F.explode(F.sequence(F.expr("ip_start div 16777216"),
                             F.expr("ip_end div 16777216")))))
    ips = (df.select(F.col(ip_col).alias("ip")).distinct()
           .withColumn("ip_num", ipv4_int(F.col("ip")))
           .withColumn("__bucket", F.expr("ip_num div 16777216")))
    joined = ips.join(
        F.broadcast(exploded),
        (ips["__bucket"] == exploded["__bucket"])
        & F.col("ip_num").between(F.col("ip_start"), F.col("ip_end")),
        "left")
    from pyspark.sql import Window
    w = (Window.partitionBy("ip")
         .orderBy(F.col("prefix").desc_nulls_last(),
                  F.col("asn").asc_nulls_last(), F.col("cidr")))
    return (joined
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select("ip", "ip_num", "prefix", "cidr", "asn", "org"))
