#!/usr/bin/env python
"""spark-submit entry point for the crawl-frontier planning stage —
the fourth production launch surface next to jobs/extract_job.py,
jobs/curate_job.py and jobs/media_job.py (north_rule mode:
`spark-submit --py-files` on a multi-executor cluster).

    cd /root/repo && zip -qr /tmp/crh_spark.zip claude_readability_hook_spark
    spark-submit --py-files /tmp/crh_spark.zip jobs/frontier_job.py \
        --input  /path/to/candidate-urls.parquet   # (url[, priority])
        --output /path/to/out \
        [--n-fetchers 64] [--delay-ms 1000] [--host-budget 1000] \
        [--trim-salts 8] [--no-url-filter] [--robots robots.parquet] \
        [--sitemaps sitemaps.parquet] [--fetch-log results.parquet] \
        [--authority ranks.parquet --min-authority-micro 1000] \
        [--stream [--checkpoint DIR]]   # streaming gate mode

Pipeline (narrow columns only — never page bytes):

  sitemap ingest  optional: discovered URLs join the frontier with
                  their sitemap priorities (micro-units); duplicates
                  keep the max priority
  fetch-log settle optional: the previous round's outcomes —
                  done/permanent/exhausted URLs leave the frontier,
                  transient failures land in retry_plan/ with their
                  exponential backoff (plan_retries)
  robots gate     optional: parse per-host robots.txt wildcard
                  sections, drop disallowed URLs (Google longest-match
                  precedence) into rejected_robots/; per-host
                  Crawl-delay honored in the fetch offsets
  URL gate        RefinedWeb-style pre-fetch quality filter
                  (frontier.url_quality): digit/hyphen host
                  heuristics, path depth, length, soft-ban score.
                  Rejected URLs land in rejected/ with their feature
                  row — crawl governance wants the why, not a drop.
  schedule        host-affine fetcher sharding + per-host fetch slots
                  + crawl-delay offsets + host budgets
                  (frontier.schedule_frontier; trim_salts switches to
                  the salted two-phase plan for mega-hosts).

Outputs under --output: plan/ (parquet: url, host, fetcher_id, slot,
fetch_offset_ms, keep) and rejected/ (parquet feature rows), plus ONE
JSON summary line on stdout — the shared jobs/ contract.

The reference never plans a crawl (it serves single URLs behind a
gateway, apps/gateway/src/features/extract); at 10^12 candidate URLs
the plan IS the crawler, so this surface exists only Spark-side.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="candidate-URL parquet")
    parser.add_argument("--output", required=True)
    parser.add_argument("--n-fetchers", type=int, default=64)
    parser.add_argument("--delay-ms", type=int, default=1000)
    parser.add_argument("--host-budget", type=int, default=None)
    parser.add_argument(
        "--trim-salts",
        default="auto",
        help="mega-host regime: 'auto' (default — hosts above "
        "--hot-host-rows candidate URLs are detected and routed "
        "through the salted two-phase plan), 'none' (direct "
        "single-window plan for every host), or an integer (salt "
        "every host that many ways; needs --host-budget)",
    )
    parser.add_argument(
        "--hot-host-rows",
        type=int,
        default=None,
        help="auto-regime hot-host detection threshold (candidate "
        "URLs per host; default 1000000)",
    )
    parser.add_argument(
        "--no-url-filter",
        action="store_true",
        help="skip the RefinedWeb URL quality gate",
    )
    parser.add_argument(
        "--robots",
        default=None,
        help="robots.txt parquet (host, robots_txt): parse the "
        "wildcard-agent sections and drop disallowed URLs (Google "
        "longest-match precedence) before scheduling",
    )
    parser.add_argument(
        "--sitemaps",
        default=None,
        help="sitemap XML parquet (host, sitemap_xml): discovered URLs "
        "join the frontier carrying their sitemap priorities "
        "(micro-units); duplicates keep the max priority",
    )
    parser.add_argument(
        "--authority",
        default=None,
        help="domain PageRank parquet (domain, rank_micro — linkgraph."
        "domain_pagerank_micro output): REPLACES the input priority "
        "with the composed quality priority (authority + domain "
        "quality + URL score, frontier.compose_frontier_priority)",
    )
    parser.add_argument(
        "--domain-quality",
        default=None,
        help="domain signal parquet (domain, quality_micro — domains."
        "domain_signals output): joins the composed priority",
    )
    parser.add_argument(
        "--min-authority-micro",
        type=int,
        default=None,
        help="with --authority: URLs whose registrable domain's "
        "normalized authority falls below this micro threshold land "
        "in rejected_authority/ and lose their fetch slots",
    )
    parser.add_argument(
        "--stream",
        action="store_true",
        help="STREAMING mode: treat --input as a watched directory of "
        "(url, priority) parquet discovery drops and run the "
        "replay-idempotent streaming frontier gate "
        "(streaming/frontier_stream.py) — in-batch dedup, stored "
        "seen-set anti-join, URL quality gate — emitting "
        "scheduled/batch_id=N, rejected/batch_id=N and the "
        "bucket-partitioned seen/ store under --output "
        "(availableNow trigger: drains what is there, then exits)",
    )
    parser.add_argument(
        "--checkpoint",
        default=None,
        help="streaming checkpoint dir (default: <output>/checkpoint)",
    )
    parser.add_argument(
        "--fetch-log",
        default=None,
        help="fetch-result parquet (url, attempt, status) from the "
        "previous crawl round: done/permanent/exhausted URLs leave "
        "the frontier, retry verdicts land in retry_plan/ with their "
        "backoff",
    )
    args = parser.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("crh-spark-frontier").getOrCreate()

    if args.stream:
        from claude_readability_hook_spark.streaming.frontier_stream import (
            gate_frontier_stream,
        )

        q = gate_frontier_stream(
            spark.readStream.schema("url string, priority long").parquet(
                args.input
            ),
            seen_root=f"{args.output}/seen",
            scheduled_dir=f"{args.output}/scheduled",
            rejected_dir=f"{args.output}/rejected",
            checkpoint_dir=args.checkpoint or f"{args.output}/checkpoint",
        )
        q.awaitTermination()

        def _count(path: str) -> int:
            # an empty discovery directory drains zero batches and
            # writes no sinks — report zeros, don't crash the summary
            try:
                return spark.read.parquet(path).count()
            except Exception:  # noqa: BLE001 — AnalysisException: no files
                return 0

        print(
            json.dumps(
                {
                    "mode": "stream",
                    "scheduled": _count(f"{args.output}/scheduled"),
                    "rejected": _count(f"{args.output}/rejected"),
                    "seen": _count(f"{args.output}/seen"),
                }
            )
        )
        spark.stop()
        return

    from claude_readability_hook_spark.operators.frontier import (
        parse_crawl_delays,
        parse_robots,
        parse_sitemaps,
        plan_retries,
        robots_gate,
        schedule_frontier,
        schedule_frontier_with_delays,
        url_quality,
    )

    urls = spark.read.parquet(args.input)
    if "priority" not in urls.columns:
        urls = urls.withColumn("priority", F.lit(0).cast("long"))
    urls = urls.select("url", "priority")
    n_discovered = 0
    if args.sitemaps:
        sm = parse_sitemaps(spark.read.parquet(args.sitemaps)).select(
            "url", F.col("priority_micro").alias("priority")
        )
        n_discovered = sm.count()
        # duplicates (seed list ∩ sitemap) keep the max priority
        urls = (
            urls.unionByName(sm)
            .groupBy("url")
            .agg(F.max("priority").alias("priority"))
        )
    n_in = urls.count()

    n_settled = 0
    if args.fetch_log:
        # previous round's outcomes: settled URLs (fetched OK, gone for
        # good, or out of retries) leave the frontier; transient
        # failures keep their slot and carry a backoff for the fetcher
        verdicts = plan_retries(spark.read.parquet(args.fetch_log))
        verdicts.filter(F.col("verdict") == "retry").write.mode(
            "overwrite"
        ).parquet(f"{args.output}/retry_plan")
        settled = verdicts.filter(
            F.col("verdict").isin("done", "permanent", "exhausted")
        ).select("url")
        before = urls.count()
        urls = urls.join(settled, "url", "left_anti")
        n_settled = before - urls.count()

    n_rejected = 0
    if not args.no_url_filter:
        feats = url_quality(urls.select("url"))
        feats.filter(~F.col("keep")).write.mode("overwrite").parquet(
            f"{args.output}/rejected"
        )
        keepers = feats.filter(F.col("keep")).select("url")
        before = urls.count()
        urls = urls.join(keepers, "url", "left_semi")
        n_rejected = before - urls.count()

    n_disallowed = 0
    n_sitemap_urls = 0
    robots_df = None
    if args.robots:
        from claude_readability_hook_spark.operators.frontier import (
            parse_sitemap_urls,
        )

        robots_df = spark.read.parquet(args.robots)
        # `Sitemap:` directives are the next round's sitemap FETCH
        # list (their bodies come back through --sitemaps)
        sm_urls = parse_sitemap_urls(robots_df)
        sm_urls.write.mode("overwrite").parquet(
            f"{args.output}/sitemap_urls"
        )
        n_sitemap_urls = spark.read.parquet(
            f"{args.output}/sitemap_urls"
        ).count()
        rules = parse_robots(robots_df)
        verdicts = robots_gate(urls.select("url"), rules)
        verdicts.filter(~F.col("allowed")).write.mode("overwrite").parquet(
            f"{args.output}/rejected_robots"
        )
        allowed = verdicts.filter(F.col("allowed")).select("url")
        before = urls.count()
        urls = urls.join(allowed, "url", "left_semi")
        n_disallowed = before - urls.count()

    n_low_authority = 0
    if args.authority or args.domain_quality:
        from claude_readability_hook_spark.operators.frontier import (
            compose_frontier_priority,
        )

        authority = (
            spark.read.parquet(args.authority) if args.authority else None
        )
        dq = (
            spark.read.parquet(args.domain_quality)
            if args.domain_quality
            else None
        )
        pri = compose_frontier_priority(
            urls.select("url"), authority=authority, domain_quality=dq
        )
        if args.min_authority_micro is not None and authority is not None:
            # only MEASURED-low domains lose their slots — an unknown
            # domain (auth_micro 0 by composition) is unmeasured, not
            # bad, and blocking it would starve discovery
            low = pri.filter(
                F.col("auth_micro") < args.min_authority_micro
            ).join(
                F.broadcast(authority.select("domain")), "domain", "left_semi"
            )
            low.write.mode("overwrite").parquet(
                f"{args.output}/rejected_authority"
            )
            pri = pri.join(low.select("url"), "url", "left_anti")
            n_low_authority = spark.read.parquet(
                f"{args.output}/rejected_authority"
            ).count()
        # the composed quality priority replaces the seed priority
        urls = pri.select("url", F.col("priority_micro").alias("priority"))

    from claude_readability_hook_spark.operators.frontier import (
        _URL_HOST_RE,
        FRONTIER_HOT_HOST_ROWS,
    )

    trim_salts: int | str | None
    if args.trim_salts == "auto":
        trim_salts = "auto"
    elif args.trim_salts in ("none", "None"):
        trim_salts = None
    else:
        trim_salts = int(args.trim_salts)
    salt_kw = dict(
        trim_salts=trim_salts,
        hot_host_rows=args.hot_host_rows or FRONTIER_HOT_HOST_ROWS,
    )

    candidates = urls.select(
        "url",
        F.regexp_extract("url", _URL_HOST_RE, 1).alias("host"),
        "priority",
    )
    if robots_df is not None:
        # robots known → honor each host's own Crawl-delay directive
        # (hosts without one fall back to --delay-ms)
        plan = schedule_frontier_with_delays(
            candidates,
            parse_crawl_delays(robots_df, default_delay_ms=args.delay_ms),
            n_fetchers=args.n_fetchers,
            default_delay_ms=args.delay_ms,
            host_budget=args.host_budget,
            **salt_kw,
        )
    else:
        plan = schedule_frontier(
            candidates,
            n_fetchers=args.n_fetchers,
            delay_ms=args.delay_ms,
            host_budget=args.host_budget,
            **salt_kw,
        )
    # partition the plan by fetcher: each of the n_fetchers workers
    # reads exactly its own directory (partition pruning on the
    # fetcher_id filter) instead of scanning the whole plan — the
    # layout that matters at 10^12 URLs over a 1000-fetcher fleet
    plan.write.mode("overwrite").partitionBy("fetcher_id").parquet(
        f"{args.output}/plan"
    )

    planned = spark.read.parquet(f"{args.output}/plan")
    n_planned = planned.count()
    n_over_budget = planned.filter(~F.col("keep")).count()
    n_hosts = planned.select("host").distinct().count()
    print(
        json.dumps(
            {
                "urls_in": n_in,
                "sitemap_discovered": n_discovered,
                "settled": n_settled,
                "url_rejected": n_rejected,
                "robots_disallowed": n_disallowed,
                "sitemap_urls_discovered": n_sitemap_urls,
                "low_authority": n_low_authority,
                "planned": n_planned,
                "over_budget": n_over_budget,
                "hosts": n_hosts,
                "fetchers": args.n_fetchers,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
