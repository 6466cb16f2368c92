"""Strict local replica of the correctness driver at an arbitrary SF.

Runs every driver-window query (or --all for the full registry)
side-by-side with its DuckDB oracle on the given sf directory and
records per-query row-count, schema, and VALUE-HASH matches — the
driver's own standard, not the isclose-tolerant pytest compare.
The hash is md5 over rows sorted by the name-sorted column tuple
with every value rendered via str() after float round-trip repr —
any cross-engine double divergence (the r4 bm25 rounding tie) fails
here, exactly as it fails the driver.

Run:  python tools/oracle_replica.py                 # sf0.1, window
      python tools/oracle_replica.py --sf-dir /root/testdata/sf0.01
      python tools/oracle_replica.py --all --out CORRECTNESS_local.json

Writes a CORRECTNESS_r-style JSON (default
CORRECTNESS_local_sf01.json) for committing alongside the driver's
artifact (VERDICT r4 task 3).
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def _render(v) -> str:
    if v is None:
        return ""
    if isinstance(v, float):
        if v == -0.0:
            v = 0.0
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_render(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def _value_hash(rows, cols) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(_render(row[i]) for i in order) for row in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode("utf-8", "surrogatepass"))
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--all", action="store_true",
                    help="full registry, not just the driver window")
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None,
                    help="comma-separated query names")
    args = ap.parse_args()
    sf_tag = os.path.basename(args.sf_dir.rstrip("/"))
    out_path = args.out or f"CORRECTNESS_local_{sf_tag}.json"

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.driver.memory", "48g")
        .appName("oracle-replica").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')")

    qs = dict(entrymod.queries())
    if args.all:
        qs.update(entrymod.extra_queries())
    if args.only:
        keep = set(args.only.split(","))
        qs = {k: v for k, v in qs.items() if k in keep}
    oracles = entrymod.oracle_sql()

    results: dict[str, dict] = {}
    t_start = time.time()
    for name, qfn in qs.items():
        rec = {"rows_match": None, "schema_match": None,
               "hash_match": None, "spark_rows": None,
               "oracle_rows": None, "err": None}
        t0 = time.time()
        try:
            sdf = qfn(spark, args.sf_dir)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(s_rows)
            sql = oracles.get(name)
            if sql is None:
                rec["rows_match"] = len(s_rows) >= 0
                rec["schema_match"] = bool(s_cols)
                rec["note"] = "rows-only (no SQL twin)"
            else:
                res = con.execute(sql)
                o_cols = [d[0] for d in res.description]
                o_rows = res.fetchall()
                rec["oracle_rows"] = len(o_rows)
                rec["rows_match"] = len(s_rows) == len(o_rows)
                rec["schema_match"] = sorted(s_cols) == sorted(o_cols)
                rec["hash_match"] = (
                    rec["rows_match"] and rec["schema_match"]
                    and _value_hash(s_rows, s_cols)
                    == _value_hash(o_rows, o_cols))
        except Exception as exc:  # record, keep going
            rec["err"] = f"{type(exc).__name__}: {exc}"[:400]
        rec["sec"] = round(time.time() - t0, 2)
        results[name] = rec
        flag = ("OK" if rec["hash_match"]
                else "rows-only" if rec.get("note")
                and rec["rows_match"] else "FAIL")
        print(f"{name:36s} {flag:9s} {rec['sec']:7.2f}s "
              f"spark={rec['spark_rows']} oracle={rec['oracle_rows']}",
              flush=True)

    summary = {
        "sf_dir": args.sf_dir,
        "n_queries": len(results),
        "n_hash_green": sum(1 for r in results.values()
                            if r["hash_match"]),
        "n_rows_only": sum(1 for r in results.values()
                           if r.get("note") and r["rows_match"]),
        "n_fail": sum(1 for r in results.values()
                      if not r["hash_match"] and not (
                          r.get("note") and r["rows_match"])),
        "total_sec": round(time.time() - t_start, 1),
    }
    with open(out_path, "w") as f:
        json.dump({"summary": summary, "queries": results}, f,
                  indent=1, sort_keys=True)
    print(json.dumps(summary))
    spark.stop()
    con.close()
    return 0 if summary["n_fail"] == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
