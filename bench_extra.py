#!/usr/bin/env python
"""Extra benchmarks for the optimization rounds (bench.py is FROZEN).

Times individual declared queries with the noop sink (guide §1.4) at an
arbitrary SF dir, and dumps .explain("formatted") plans for the
plans/r*/ evidence files. Never used by the driver; numbers are cited
in OPTIMIZATION_r*.md.

Usage:
  python bench_extra.py time  <sf_dir> <query[,query...]> [passes]
  python bench_extra.py plan  <sf_dir> <query[,query...]> <out_dir> [suffix]
  python bench_extra.py all   <sf_dir> [passes]     # every queries() entry
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _spark():
    from bench import make_spark, CPUS
    return make_spark(CPUS)


def _warm(spark):
    # spin up reused Python workers once (same as bench.run_queries)
    spark.range(0, 10_000, 1, spark.sparkContext.defaultParallelism) \
        .mapInPandas(lambda it: it, "id long").count()


def cmd_time(sf_dir: str, names: list[str], passes: int) -> None:
    import __spark_entry__ as entrymod
    spark = _spark()
    _warm(spark)
    qs = entrymod.queries()
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        best = None
        samples = []
        for _ in range(passes):
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            dt = time.monotonic() - t0
            samples.append(round(dt, 3))
            best = dt if best is None or dt < best else best
        out[name] = {"min": round(best, 3), "samples": samples}
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()
    print("BENCH_EXTRA " + json.dumps(
        {"sf_dir": sf_dir, "passes": passes,
         "queries": {k: v["min"] for k, v in out.items()}}))


def cmd_plan(sf_dir: str, names: list[str], out_dir: str,
             suffix: str) -> None:
    import __spark_entry__ as entrymod
    spark = _spark()
    qs = entrymod.queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print("wrote", path)
    spark.stop()


def main() -> None:
    mode = sys.argv[1]
    sf_dir = sys.argv[2]
    if mode == "time":
        names = sys.argv[3].split(",")
        passes = int(sys.argv[4]) if len(sys.argv) > 4 else 2
        cmd_time(sf_dir, names, passes)
    elif mode == "plan":
        names = sys.argv[3].split(",")
        out_dir = sys.argv[4]
        suffix = sys.argv[5] if len(sys.argv) > 5 else "before"
        cmd_plan(sf_dir, names, out_dir, suffix)
    elif mode == "all":
        import __spark_entry__ as entrymod
        passes = int(sys.argv[3]) if len(sys.argv) > 3 else 2
        cmd_time(sf_dir, list(entrymod.queries()), passes)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
