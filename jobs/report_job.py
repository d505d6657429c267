#!/usr/bin/env python
"""spark-submit entry point for the corpus health report — the fifth
launch surface (extract / curate / media / frontier / report): the
first job an operator runs on a fresh crawl dump, and the one a
governance dashboard polls per snapshot.

    cd /root/repo && zip -qr /tmp/crh_spark.zip claude_readability_hook_spark
    spark-submit --py-files /tmp/crh_spark.zip jobs/report_job.py \
        --input /path/to/documents.parquet --output /path/to/out \
        [--gate-sample 0]   # PERCENT of rows entering the per-doc
                            # gates, 0-100 (0 = all rows, no sampling)

Sections (each reuses the audited batch operator — the report never
reimplements a metric):

  volume      corpus_report: doc/source counts, byte/token volumes,
              length distribution, short-doc rate (ONE global agg)
  quality     keep rates of the three published-rule gates — Gopher
              word-level (gopher_quality), C4 page gates (c4_quality),
              Gopher duplicate-line (line_repetition ≤ 0.30 dup-char)
              — each a pure in-row scan + 1-row agg
  domains     per-registrable-domain signals (doc counts, dup rates,
              quality rates, PII density) when a `host` column exists

Outputs: report.json under --output (single governance document) plus
domains/ parquet for the dashboard drill-down, and the SAME JSON on
stdout — the shared jobs/ contract."""

from __future__ import annotations

import argparse
import json


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="documents parquet")
    parser.add_argument("--output", required=True)
    parser.add_argument(
        "--gate-sample",
        type=int,
        default=0,
        help="PERCENT of rows entering the per-doc gates, in [0, 100] "
        "(deterministic doc_id-hash sample — abs(xxhash64(doc_id)) %% "
        "100 < N; 0 = every row, i.e. no sampling)",
    )
    parser.add_argument(
        "--edges",
        default=None,
        help="domain link-edge parquet (src, dst): adds PageRank "
        "authority (top-10 in the JSON, full table in authority/)",
    )
    parser.add_argument(
        "--frontier",
        default=None,
        help="a frontier_job --output directory: adds crawl-health "
        "metrics from plan/ (slot utilization, keep rate, host/"
        "fetcher spread) and retry_plan/ when present (verdict mix, "
        "backoff p50/max)",
    )
    args = parser.parse_args()
    if not 0 <= args.gate_sample <= 100:
        parser.error(
            f"--gate-sample is a percent in [0, 100], got {args.gate_sample}"
        )

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("crh-spark-report").getOrCreate()

    from claude_readability_hook_spark.operators.textstats import (
        c4_quality,
        corpus_report,
        gopher_quality,
        line_repetition,
    )

    docs = spark.read.parquet(args.input)
    body = docs.select("doc_id", "text", "source")
    gated = body
    if args.gate_sample > 0:
        # deterministic hash sample — reruns report the same numbers
        gated = body.filter(
            F.abs(F.xxhash64("doc_id")) % 100 < args.gate_sample
        )

    volume = corpus_report(body).collect()[0].asDict()

    def keep_rate(df, col="keep"):
        row = df.agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col(col).cast("long")).cast("long").alias("kept"),
        ).collect()[0]
        return {
            "n": row["n"],
            "kept": row["kept"],
            "keep_rate": (row["kept"] / row["n"]) if row["n"] else None,
        }

    quality = {
        "gopher": keep_rate(gopher_quality(gated)),
        "c4": keep_rate(c4_quality(gated)),
        "line_dup": keep_rate(
            line_repetition(gated).select(
                (F.col("dup_char_frac") <= 0.30).alias("keep")
            )
        ),
    }

    domains = None
    if "host" in docs.columns:
        from claude_readability_hook_spark.operators.domains import (
            domain_signals,
        )

        sig = domain_signals(docs)
        sig.write.mode("overwrite").parquet(f"{args.output}/domains")
        domains = {
            "n_domains": sig.count(),
            "parquet": f"{args.output}/domains",
        }

    authority = None
    if args.edges:
        from claude_readability_hook_spark.operators.linkgraph import (
            domain_pagerank,
        )

        ranks = domain_pagerank(spark.read.parquet(args.edges))
        ranks.write.mode("overwrite").parquet(f"{args.output}/authority")
        top = ranks.orderBy(F.col("rank").desc(), "domain").limit(10).collect()
        authority = {
            "n_domains": ranks.count(),
            "top": [{"domain": r["domain"], "rank": r["rank"]} for r in top],
            "parquet": f"{args.output}/authority",
        }

    frontier = None
    if args.frontier:
        plan = spark.read.parquet(f"{args.frontier}/plan")
        row = plan.agg(
            F.count("*").cast("long").alias("planned"),
            F.sum(F.col("keep").cast("long")).cast("long").alias("kept"),
            F.countDistinct("host").cast("long").alias("hosts"),
            F.countDistinct("fetcher_id").cast("long").alias("fetchers"),
            F.max("slot").cast("long").alias("max_slot"),
            F.expr("percentile_approx(slot, 0.99)").cast("long").alias(
                "slot_p99"
            ),
        ).collect()[0]
        frontier = {
            "planned": row["planned"],
            "kept": row["kept"],
            "keep_rate": (
                row["kept"] / row["planned"] if row["planned"] else None
            ),
            "hosts": row["hosts"],
            "fetchers": row["fetchers"],
            "max_slot": row["max_slot"],
            "slot_p99": row["slot_p99"],
        }
        try:
            retries = spark.read.parquet(f"{args.frontier}/retry_plan")
            r = retries.agg(
                F.count("*").cast("long").alias("n"),
                F.expr("percentile_approx(retry_after_ms, 0.5)")
                .cast("long")
                .alias("backoff_p50"),
                F.max("retry_after_ms").cast("long").alias("backoff_max"),
            ).collect()[0]
            frontier["retry"] = {
                "n": r["n"],
                "backoff_p50_ms": r["backoff_p50"],
                "backoff_max_ms": r["backoff_max"],
            }
        except Exception:  # noqa: BLE001 — no retry_plan/ written
            frontier["retry"] = None

    report = {
        "volume": volume,
        "quality": quality,
        "domains": domains,
        "authority": authority,
        "frontier": frontier,
    }
    payload = json.dumps(report, default=str)
    spark.sparkContext.parallelize([payload], 1).saveAsTextFile(
        f"{args.output}/report.json"
    )
    print(payload)
    spark.stop()


if __name__ == "__main__":
    main()
