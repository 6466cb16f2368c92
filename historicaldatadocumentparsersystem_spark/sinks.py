"""Handoff sinks: the engine's output surface toward the tokenizer /
training stack.

Curation ends with two artifacts every training pipeline expects:
sharded JSONL (the lingua franca tokenizer pipelines consume) and a
dataset card (the datasheet quoting sizes, token counts, and language
mix). Both are deterministic — same input rows => byte-stable shard
membership, byte-stable shard FILES (records are id-ordered within a
shard and serialized with sorted keys), and an identical card — so a
re-export after an incremental run changes only what actually changed.

Scale contract (round 4): each export is ONE scan of the input corpus.
Shard sizing needs the row count up front; callers that already know
it (pipeline lineage totals, a dataset card) pass ``n_rows`` and no
counting job runs at all — otherwise a single count() (footer-only
metadata when the source is parquet) sizes the shards. Per-shard
manifest counts ride the write itself (each writer task reports what
it wrote), never a second aggregation pass over the data.

Reference analog: the reference's terminal stage persists chunks into
a Postgres vector store (``pg_vector_db.py``); at corpus scale the
terminal stage is files + a manifest, because the consumer is a
training job, not a query endpoint.
"""
from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _reset_data_dir(data_dir: str) -> None:
    """Clear a previous export before writing. Shard files are written
    directly by executor tasks, so Spark's overwrite modes (static or
    dynamic, whatever the session last set) never apply here: without
    this, a re-export whose n_shards shrank would leave stale
    shard files from the previous run for readers to pick up."""
    if os.path.isdir(data_dir):
        shutil.rmtree(data_dir)
    os.makedirs(data_dir, exist_ok=True)


def _json_scalar(v):
    """Best-effort conversion of an Arrow/pandas cell to a JSON value.
    Deterministic: numpy scalars unbox, timestamps render ISO-8601 UTC,
    arrays become lists, NaN/NaT become null."""
    import numpy as np
    import pandas as pd

    if isinstance(v, (list, tuple)):
        return [_json_scalar(x) for x in v]
    if isinstance(v, np.ndarray):
        return [_json_scalar(x) for x in v.tolist()]
    if isinstance(v, dict):
        return {k: _json_scalar(x) for k, x in sorted(v.items())}
    if v is None:
        return None
    if isinstance(v, float) and v != v:          # NaN
        return None
    if isinstance(v, pd.Timestamp):
        if v is pd.NaT:
            return None
        return v.isoformat()
    if isinstance(v, np.generic):
        return v.item()
    if isinstance(v, (bytes, bytearray)):
        import base64
        return base64.b64encode(bytes(v)).decode("ascii")
    return v


def write_jsonl_shards(df: DataFrame, path: str,
                       id_col: str = "doc_id",
                       docs_per_shard: int = 100_000,
                       n_rows: int | None = None) -> dict:
    """Export rows as JSONL, partitioned into deterministic shards:
    shard = pmod(xxhash64(id), n_shards) with n_shards =
    ceil(n_rows / docs_per_shard) — membership depends only on the id
    (and shard count), never on cluster layout, so re-exports are
    stable and a consumer can locate any document's shard from its id.

    Layout: ``{path}/data/shard=N/part-00000.jsonl`` (one JSON object
    per line, keys sorted, records ordered by id — byte-stable files)
    plus ``{path}/manifest.json`` carrying per-shard row counts and
    the total. Returns the manifest dict.

    Scale: ONE scan of the input — a single shuffle on the shard key,
    with each shard serialized and written by the executor task that
    owns it; the per-shard counts in the manifest are the writer
    tasks' own reports, not a second aggregation pass. Pass ``n_rows``
    (e.g. from pipeline lineage totals or a dataset card) to skip the
    sizing count() entirely; manifest counts are always the observed
    written rows regardless. Stale shard dirs from a previous, larger
    export are cleared before writing — Spark overwrite modes are
    irrelevant here because the tasks write the files themselves.
    """
    import pandas as pd

    if n_rows is None:
        n_rows = df.count()
    n_shards = max(1, -(-n_rows // docs_per_shard))
    data_dir = os.path.join(path, "data")
    _reset_data_dir(data_dir)

    sharded = df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col)),
                        F.lit(n_shards)).cast("int"))
    cols = [c for c in sharded.columns if c != "shard"]

    def write(batches):
        rows_by_shard: dict[int, list] = {}
        for b in batches:
            shards = b["shard"]
            for i in range(len(b)):
                rec = {c: _json_scalar(b[c].iloc[i]) for c in cols}
                rows_by_shard.setdefault(int(shards.iloc[i]),
                                         []).append(rec)
        out = []
        for sh, recs in rows_by_shard.items():
            recs.sort(key=lambda r: str(r[id_col]))
            blob = "".join(json.dumps(r, sort_keys=True,
                                      ensure_ascii=False) + "\n"
                           for r in recs).encode("utf-8")
            d = os.path.join(data_dir, f"shard={sh}")
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, "part-00000.jsonl"), "wb") as fh:
                fh.write(blob)
            out.append((sh, len(recs), len(blob)))
        yield pd.DataFrame(out, columns=("shard", "n", "n_bytes"))

    stats = (sharded.repartition(n_shards, "shard")
             .mapInPandas(write, "shard int, n long, n_bytes long")
             .collect())
    per_shard = {int(r["shard"]): int(r["n"]) for r in stats}
    manifest = {
        "format": "jsonl",
        "n_rows": int(sum(per_shard.values())),
        "n_shards": int(n_shards),
        "docs_per_shard": int(docs_per_shard),
        "shards": {str(k): per_shard.get(k, 0)
                   for k in range(n_shards)},
    }
    tmp = os.path.join(path, "manifest.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(path, "manifest.json"))
    return manifest


def read_jsonl_shards(spark, path: str) -> DataFrame:
    """Read a ``write_jsonl_shards`` export back (shard column
    restored from the partition dirs)."""
    return spark.read.json(os.path.join(path, "data"))


def dataset_card(df: DataFrame, text_col: str = "text",
                 lang_col: str | None = "lang") -> dict:
    """The dataset datasheet: corpus-level numbers a release quotes —
    document count, whitespace-token and character totals, exact-dup
    ratio (md5), and the per-language mix (docs + tokens + basis-point
    shares). Deterministic integers only.

    Scale: one global aggregate + one groupBy(lang) — two passes of
    map-side-combinable aggregation, nothing collected but the
    |langs|-row mix.
    """
    from .operators.textstats import tokens

    base = df.select(
        F.size(tokens(text_col)).cast("long").alias("n_tok"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        F.md5(F.col(text_col)).alias("h"),
        *( [F.coalesce(F.col(lang_col), F.lit("unknown")).alias("lang")]
           if lang_col else [F.lit("all").alias("lang")] ))
    tot = base.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.countDistinct("h").cast("long").alias("n_distinct")).first()
    mix = (base.groupBy("lang")
           .agg(F.count("*").cast("long").alias("docs"),
                F.sum("n_tok").cast("long").alias("tokens"))
           .collect())
    n_docs = int(tot["n_docs"]) or 1
    n_tokens = int(tot["n_tokens"] or 0)
    return {
        "n_docs": int(tot["n_docs"]),
        "n_tokens": n_tokens,
        "n_chars": int(tot["n_chars"] or 0),
        "exact_dup_bp": int((tot["n_docs"] - tot["n_distinct"])
                            * 10000 // n_docs),
        "languages": {
            r["lang"]: {"docs": int(r["docs"]),
                        "tokens": int(r["tokens"] or 0),
                        "doc_share_bp": int(r["docs"] * 10000
                                            // n_docs),
                        "token_share_bp": int((r["tokens"] or 0)
                                              * 10000
                                              // max(n_tokens, 1))}
            for r in sorted(mix, key=lambda r: r["lang"])},
    }


def write_dataset_card(df: DataFrame, path: str,
                       text_col: str = "text",
                       lang_col: str | None = "lang") -> dict:
    """Compute and persist the card as ``{path}/dataset_card.json``."""
    card = dataset_card(df, text_col, lang_col)
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, "dataset_card.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(card, fh, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(path, "dataset_card.json"))
    return card


def write_wet_shards(df: DataFrame, path: str,
                     url_col: str = "url", text_col: str = "text",
                     ts_col: str = "warc_ts",
                     docs_per_shard: int = 100_000,
                     gzip_records: bool = True,
                     n_rows: int | None = None) -> dict:
    """Export extracted text as WET shards — the archive ecosystem's
    OWN interchange format (Common Crawl publishes extraction output
    exactly this way), so downstream consumers that already ingest
    CC WET can ingest this engine's output unchanged, and
    ``sources.read_wet_documents`` round-trips it byte-identically.

    Shard membership is pmod(xxhash64(url), n_shards) — the same
    deterministic rule as the JSONL sink. Each shard is built by ONE
    task from the Spark-free ``extractor.warcx.build_wet`` (the
    parser's exactness witness) and written as
    ``{path}/data/shard-NNNNN.warc.wet[.gz]``; records within a
    shard are (url, warc_ts, text)-ordered so re-exports are
    byte-stable even when the same url appears twice (e.g. two crawl
    snapshots). Returns the manifest (persisted as
    ``{path}/manifest.json``).

    Scale: ONE scan of the input — a single shuffle on the shard key;
    shard bytes are assembled and written inside the executor (one
    file per shard, no driver collect of row data) and the manifest's
    totals are the writer tasks' own reports. Pass ``n_rows`` (from
    lineage totals) to skip the sizing count(). The data dir is
    cleared first so a shrinking re-export can't leave stale shard
    files behind. Null timestamps default to the epoch.
    """
    import pandas as pd

    from .extractor.warcx import build_wet

    if n_rows is None:
        n_rows = df.count()
    n_shards = max(1, -(-n_rows // docs_per_shard))
    data_dir = os.path.join(path, "data")
    _reset_data_dir(data_dir)
    suffix = ".warc.wet.gz" if gzip_records else ".warc.wet"

    sharded = (df.select(
        F.col(url_col).alias("url"),
        F.coalesce(F.col(ts_col).cast("timestamp"),
                   F.lit("1970-01-01 00:00:00").cast("timestamp"))
        .alias("warc_ts"),
        F.coalesce(F.col(text_col), F.lit("")).alias("text"))
        .withColumn("shard", F.pmod(F.xxhash64("url"),
                                    F.lit(n_shards)).cast("int")))

    def write(batches):
        from datetime import timezone
        rows_by_shard: dict[int, list] = {}
        for b in batches:
            for u, ts, tx, sh in zip(b["url"], b["warc_ts"],
                                     b["text"], b["shard"]):
                ts = ts.to_pydatetime().replace(tzinfo=timezone.utc)
                rows_by_shard.setdefault(int(sh), []).append(
                    {"url": u, "warc_ts": ts, "text": tx})
        out = []
        for sh, recs in rows_by_shard.items():
            recs.sort(key=lambda r: (r["url"], r["warc_ts"],
                                     r["text"]))
            blob = build_wet(recs, gzip_records=gzip_records)
            fname = os.path.join(data_dir, f"shard-{sh:05d}{suffix}")
            with open(fname, "wb") as fh:
                fh.write(blob)
            out.append((sh, len(recs), len(blob)))
        yield pd.DataFrame(out, columns=("shard", "n_docs", "n_bytes"))

    stats = (sharded.repartition(n_shards, "shard")
             .mapInPandas(write, "shard int, n_docs long, n_bytes long")
             .collect())
    manifest = {
        "format": "wet", "gzip": bool(gzip_records),
        "n_rows": int(sum(int(r["n_docs"]) for r in stats)),
        "n_shards": int(n_shards),
        "shards": {str(r["shard"]): {"n_docs": int(r["n_docs"]),
                                     "n_bytes": int(r["n_bytes"])}
                   for r in stats},
    }
    tmp = os.path.join(path, "manifest.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(path, "manifest.json"))
    return manifest
