"""Dump .explain('formatted') for a list of queries to a directory —
the r9 optimization round's before/after plan evidence
(plans/r09/<query>_{before,after}.txt). Run from a repo root:

    python tools/dump_plans_r09.py OUTDIR SUFFIX [q1 q2 ...]

SUFFIX is 'before' or 'after'. Uses the same session shape as
bench.py so plan choices (AQE, broadcast thresholds, shuffle
partitions) match what the bench executes. Driver-coordinated queries
(BPE/unigram/PageRank trainers) run their training loops during plan
construction — expected, a few seconds each.
"""

import os
import sys

sys.path.insert(0, os.getcwd())

from bench import build_session  # noqa: E402


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark = build_session(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        for name in names:
            try:
                df = qs[name](spark, sf_dir)
                txt = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
            except Exception as exc:  # noqa: BLE001 — record, keep going
                txt = f"EXPLAIN FAILED: {exc!r}\n"
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(txt)
            print(name, flush=True)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
