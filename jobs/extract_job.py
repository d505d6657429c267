#!/usr/bin/env python
"""spark-submit entry point for the extraction pipeline (north_rule:
'run via spark-submit --py-files on a multi-executor cluster').

Packaging + launch:

    cd /root/repo && zip -qr /tmp/crh_spark.zip claude_readability_hook_spark
    spark-submit --py-files /tmp/crh_spark.zip \
        jobs/extract_job.py \
        --input  /path/to/span-table.parquet-or-flat-documents-dir \
        --output /path/to/warehouse \
        [--partitions 4096] [--run-id run42] [--from-flat]

No master/session config is set here — spark-submit owns cluster
sizing; the job only states the logical plan. The run is resumable:
re-submitting with the same --output anti-joins committed doc_ids.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--partitions", type=int, default=None)
    parser.add_argument("--run-id", default=None)
    parser.add_argument(
        "--from-flat",
        action="store_true",
        help="input is a flat documents table dir; synthesize the span corpus",
    )
    parser.add_argument(
        "--from-warc",
        action="store_true",
        help="input is a directory of WARC segments (Common-Crawl-style, "
        "optionally gzipped); records become single-HTML-span docs",
    )
    parser.add_argument(
        "--export-jsonl",
        default=None,
        help="also write training shards (gzip JSONL) of the latest "
        "successful extractions to this path",
    )
    parser.add_argument("--export-shard-rows", type=int, default=100_000)
    parser.add_argument(
        "--engine-version",
        type=int,
        default=None,
        help="override EngineConfig.engine_version: committed rows from "
        "older versions re-extract (staleness policy)",
    )
    parser.add_argument(
        "--reextract-ttl-hours",
        type=float,
        default=None,
        help="also re-extract rows older than this many hours "
        "(the reference's 24h cache TTL as a batch policy)",
    )
    args = parser.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("crh-spark-extract").getOrCreate()

    from claude_readability_hook_spark.plans.pipeline import run_extraction
    from claude_readability_hook_spark.sources.catalog import TableCatalog
    from claude_readability_hook_spark.sources.corpus import corpus_from_flat

    if args.from_flat:
        src = corpus_from_flat(spark, args.input)
    elif args.from_warc:
        from pyspark.sql import functions as F

        from claude_readability_hook_spark.sources.warc import warc_to_documents

        docs = warc_to_documents(spark, args.input)
        src = docs.filter(F.col("_warc_error").isNull()).select(
            "doc_id",
            "url",
            F.array(
                F.struct(
                    F.lit("html").alias("kind"),
                    F.col("text").alias("text"),
                    F.lit("").alias("media_ref"),
                    F.lit(0).alias("offset"),
                )
            ).alias("spans"),
        )
    else:
        src = spark.read.parquet(args.input)

    from dataclasses import replace

    from claude_readability_hook_spark.config import DEFAULT

    cfg = DEFAULT
    if args.engine_version is not None:
        cfg = replace(cfg, engine_version=args.engine_version)
    if args.reextract_ttl_hours is not None:
        cfg = replace(cfg, reextract_ttl_hours=args.reextract_ttl_hours)

    catalog = TableCatalog(spark, args.output)
    result = run_extraction(
        spark,
        src,
        catalog=catalog,
        cfg=cfg,
        num_partitions=args.partitions,
        run_id=args.run_id,
    )

    n_shards = None
    if args.export_jsonl:
        from claude_readability_hook_spark.operators.resume import latest_extractions
        from claude_readability_hook_spark.sources.export import export_jsonl_shards

        n_shards = export_jsonl_shards(
            latest_extractions(result.extracted),
            args.export_jsonl,
            max_rows_per_shard=args.export_shard_rows,
        )

    summary = (
        result.lineage.groupBy()
        .sum("docs_in", "docs_out", "failures", "bytes_in")
        .collect()[0]
    )
    print(
        json.dumps(
            {
                "run_id": result.run_id,
                "docs_in": summary[0] or 0,
                "docs_out": summary[1] or 0,
                "failures": summary[2] or 0,
                "bytes_in": summary[3] or 0,
                "export_shards": n_shards,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
