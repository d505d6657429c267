#!/usr/bin/env python
"""Host-noise profile for the bench headline list (r3 verdict item 7):
run every headline query min-of-3 TWICE back-to-back in one JVM and
commit the per-query comparison to BENCH/NOISE.md, so future rounds can
tell a real regression from neighbor noise without judge re-measurement
(rounds 2 and 3 each spent judge time adjudicating ±20-40% single-run
swings that re-measured flat).

Run from the repo root on a quiet host:
    python tools/noise_profile.py          # sf0.1, local[32], ~10 min
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/noise_profile.py

Reading the table: |delta| between two same-JVM min-of-3 passes is the
measurement floor — a cross-round BENCH delta smaller than (or close
to) a query's profiled band, or the committed p90 band overall, is
noise, not regression.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses build_session / materialize / headline list)


def _headline(qs) -> list[str]:
    """The same list bench.py times (kept in one place there)."""
    import ast
    import inspect

    src = inspect.getsource(bench.run_bench)
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and getattr(node.targets[0], "id", "") == "headline":
            return [ast.literal_eval(elt) for elt in node.value.elts]
    raise RuntimeError("headline list not found in bench.run_bench")


def min_of_3(spark, fn, sf_dir) -> float:
    best = None
    for _ in range(3):
        t0 = time.monotonic()
        bench.materialize(fn(spark, sf_dir))
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = [n for n in _headline(qs) if n in qs]
    spark = bench.build_session(cpus)
    rows = []
    try:
        spark.range(1000).selectExpr("sum(id)").collect()  # JVM warmup
        for which in ("a", "b"):
            for name in names:
                t = min_of_3(spark, qs[name], sf_dir)
                rows.append((which, name, t))
    finally:
        spark.stop()

    a = {n: t for w, n, t in rows if w == "a"}
    b = {n: t for w, n, t in rows if w == "b"}
    deltas = []
    lines = [
        "# BENCH noise profile (two back-to-back min-of-3 passes, one JVM)",
        "",
        f"Generated {datetime.now(timezone.utc).isoformat(timespec='seconds')} "
        f"by tools/noise_profile.py — sf_dir={sf_dir}, local[{cpus}].",
        "",
        "The |delta| between two same-JVM min-of-3 passes is this host's",
        "measurement floor per query. A cross-round BENCH delta inside a",
        "query's band (or the p90 band overall) is host noise, not a",
        "regression; only deltas well past the band warrant a code hunt.",
        "",
        "| query | pass A (s) | pass B (s) | delta % |",
        "|---|---|---|---|",
    ]
    for name in names:
        d = 100.0 * abs(a[name] - b[name]) / max(a[name], b[name], 1e-9)
        deltas.append(d)
        lines.append(f"| {name} | {a[name]:.3f} | {b[name]:.3f} | {d:.1f} |")
    med = statistics.median(deltas)
    p90 = sorted(deltas)[int(0.9 * (len(deltas) - 1))]
    lines += [
        "",
        f"**Summary**: median |delta| = {med:.1f}%, p90 = {p90:.1f}%, "
        f"max = {max(deltas):.1f}% over {len(names)} queries.",
        "",
        "Rule of thumb for reading future BENCH_r{N}.json against this:",
        f"per-query swings under ~{max(10, round(p90 / 5) * 5)}% are",
        "indistinguishable from host noise on this machine; re-measure",
        "min-of-3 before treating anything below that as real.",
        "",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "NOISE.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines))
    print(json.dumps({"queries": len(names), "median_delta_pct": round(med, 1), "p90_delta_pct": round(p90, 1), "out": out}))


if __name__ == "__main__":
    main()
