#!/usr/bin/env python
"""Targeted per-query benchmark for optimization work (guide §1.4).

bench.py is FROZEN for driver measurement; this sibling harness exists
so optimization iterations can time a SUBSET of queries (min-of-N,
noop sink, labeled jobs) and dump their formatted plans without paying
the full 20-minute sweep.

Usage:
  python bench_extra.py q1 q2 ...          # time the named queries
  python bench_extra.py --reps 3 q1        # min-of-3
  python bench_extra.py --plans DIR q1     # also write DIR/<q>.txt explain
  python bench_extra.py --all              # every headline query once

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0 — the driver's
measured scale), SPARK_GRAFT_CPUS (default 32). Same session config as
bench.py so numbers are comparable.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import build_session, materialize  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plans", default=None, help="dir to write explain output")
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = list(qs) if args.all else args.names
    unknown = [n for n in names if n not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = build_session(cpus)
    try:
        # identical warmup to bench.py: executors + python workers
        spark.range(1000).selectExpr("sum(id)").collect()
        times: dict[str, float] = {}
        for name in names:
            if args.plans:
                os.makedirs(args.plans, exist_ok=True)
            best = None
            for _ in range(args.reps):
                spark.sparkContext.setJobDescription(f"bench_extra: {name}")
                t0 = time.monotonic()
                materialize(qs[name](spark, sf_dir))
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            spark.sparkContext.setJobDescription(None)
            times[name] = round(best, 3)
            print(f"  {name}: {times[name]}", file=sys.stderr, flush=True)
            if args.plans:
                df = qs[name](spark, sf_dir)
                with open(os.path.join(args.plans, f"{name}.txt"), "w") as f:
                    f.write(df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                    ))
        print(json.dumps({"sf_dir": sf_dir, "reps": args.reps, "queries": times,
                          "total": round(sum(times.values()), 3)}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
