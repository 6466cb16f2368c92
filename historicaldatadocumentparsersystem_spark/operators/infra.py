"""Distributed infrastructure-header mining (Alt-Svc / Server) —
Arrow passes around ``extractor/infrax.py`` plus a one-exchange
transport rollup.

Scale notes: both fan-outs are map-only 1->N mapInPandas passes
riding the capture scan (header columns only cross the Arrow
boundary); ``host_transport_profile`` adds exactly ONE host
exchange with map-side partial agg.

Pure twin: extractor/infrax.py; DuckDB twins: Alt-Svc re-derived
from the shared ITEM/DELTA/PORT regexes; Server is pure-fed VALUES
(nested parenthesis comments are not regular — documented
rows-from-parser oracle, refresh_targets precedent).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..extractor import infrax


def alt_svc_alternatives(df: DataFrame,
                         alt_col: str = "alt_svc",
                         url_col: str = "url") -> DataFrame:
    """(url, Alt-Svc value) -> one row per kept alternative (url,
    pos, proto, host, port, ma_s, persist). ``clear`` and absent
    headers emit nothing."""

    def run(batches: Iterator) -> Iterator:
        for b in batches:
            rows = []
            for url, raw in zip(b[url_col], b[alt_col]):
                d = infrax.parse_alt_svc(raw)
                if d is None:
                    continue
                for pos, proto, host, port, ma, persist in \
                        d["alts"]:
                    rows.append((url, pos, proto, host, port, ma,
                                 persist))
            out = pd.DataFrame(rows, columns=[
                "url", "pos", "proto", "host", "port", "ma_s",
                "persist"])
            out["pos"] = pd.array(out["pos"], dtype="int32")
            for c in ("port", "ma_s"):
                out[c] = pd.array(out[c], dtype="Int64")
            yield out

    return (df.select(url_col, alt_col)
            .mapInPandas(run, "url string, pos int, proto string, "
                              "host string, port bigint, "
                              "ma_s bigint, persist boolean"))


def server_products(df: DataFrame, server_col: str = "server",
                    url_col: str = "url") -> DataFrame:
    """(url, Server value) -> one row per product token (url, pos,
    product, version)."""

    def run(batches: Iterator) -> Iterator:
        for b in batches:
            rows = []
            for url, raw in zip(b[url_col], b[server_col]):
                for pos, product, ver in infrax.parse_server(raw):
                    rows.append((url, pos, product, ver))
            out = pd.DataFrame(rows, columns=[
                "url", "pos", "product", "version"])
            out["pos"] = pd.array(out["pos"], dtype="int32")
            yield out

    return (df.select(url_col, server_col)
            .mapInPandas(run, "url string, pos int, "
                              "product string, version string"))


def host_transport_profile(alts: DataFrame) -> DataFrame:
    """Alternative rows -> per-host transport posture: h3/h2
    advertisement, alternative count, longest ma. ONE host
    exchange."""
    page_host = F.split(F.split("url", "://").getItem(1),
                        "/").getItem(0)
    return (alts
            .groupBy(page_host.alias("page_host"))
            .agg(F.count("*").cast("long").alias("n_alts"),
                 F.bool_or(F.col("proto").startswith("h3"))
                 .alias("advertises_h3"),
                 F.bool_or(F.col("proto") == "h2")
                 .alias("advertises_h2"),
                 F.max("ma_s").cast("long").alias("max_ma_s"),
                 F.bool_or(F.col("persist")).alias("any_persist")))
