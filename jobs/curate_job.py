#!/usr/bin/env python
"""spark-submit entry point for the training-data curation pipeline —
the second production launch surface next to jobs/extract_job.py
(north_rule mode: `spark-submit --py-files` on a multi-executor
cluster).

    cd /root/repo && zip -qr /tmp/crh_spark.zip claude_readability_hook_spark
    spark-submit --py-files /tmp/crh_spark.zip jobs/curate_job.py \
        --input  /path/to/documents-dir \
        --output /path/to/out \
        [--cap-per-source 10000] [--val-fraction 0.1] [--langs en] \
        [--dedup minhash|exact|none] [--manifest-only]

Pipeline (all narrow joins on doc_id — text never travels past the
gate): curation gate (language ∧ quality ∧ not-exact-dup-loser) →
deterministic train/val split → per-source cap → manifest parquet, and
unless --manifest-only, the kept TRAIN documents as gzip JSONL shards.
Prints one JSON summary line."""

from __future__ import annotations

import argparse
import json


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="documents parquet dir/file")
    parser.add_argument("--output", required=True)
    parser.add_argument("--cap-per-source", type=int, default=100_000)
    parser.add_argument("--val-fraction", type=float, default=0.1)
    parser.add_argument("--langs", default="en", help="comma-separated keep set")
    parser.add_argument("--shard-rows", type=int, default=100_000)
    parser.add_argument("--manifest-only", action="store_true")
    args = parser.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("crh-spark-curate").getOrCreate()

    from claude_readability_hook_spark.operators.curation import curate
    from claude_readability_hook_spark.operators.sampling import (
        cap_per_source,
        train_val_split,
    )

    docs = spark.read.parquet(args.input)
    langs = [s.strip() for s in args.langs.split(",") if s.strip()]

    gates = curate(docs.select("doc_id", "text"))
    kept = gates.filter(
        F.col("quality_keep")
        & F.col("lang_pred").isin(langs)
        & ~F.col("is_dup_loser")
    ).select("doc_id", "lang_pred")
    split = train_val_split(docs, val_fraction=args.val_fraction).select(
        "doc_id", "split"
    )
    capped = cap_per_source(docs, max_docs=args.cap_per_source)

    manifest = kept.join(split, "doc_id").join(capped, "doc_id").select(
        "doc_id", "source", "lang_pred", "split"
    )
    manifest.write.mode("overwrite").parquet(f"{args.output}/manifest")
    manifest = spark.read.parquet(f"{args.output}/manifest")

    n_total = docs.count()
    n_manifest = manifest.count()
    n_train = manifest.filter(F.col("split") == "train").count()

    n_shards = None
    if not args.manifest_only:
        # shard the TRAIN documents; reuse the content-addressed JSONL
        # exporter by shaping docs as single-text-span rows
        from claude_readability_hook_spark.sources.export import export_jsonl_shards

        train_docs = (
            manifest.filter(F.col("split") == "train")
            .select("doc_id", "lang_pred")
            .join(docs.select("doc_id", "text"), "doc_id")
            .select(
                "doc_id",
                F.col("lang_pred").alias("title"),
                F.lit("curate").alias("engine"),
                F.lit(1.0).alias("score"),
                F.lit(True).alias("success"),
                F.array(
                    F.struct(
                        F.lit("text").alias("kind"),
                        F.col("text").alias("text"),
                        F.lit("").alias("media_ref"),
                        F.lit(0).alias("offset"),
                    )
                ).alias("spans"),
            )
        )
        n_shards = export_jsonl_shards(
            train_docs, f"{args.output}/shards", max_rows_per_shard=args.shard_rows
        )

    print(
        json.dumps(
            {
                "docs_in": n_total,
                "manifest_rows": n_manifest,
                "train_rows": n_train,
                "val_rows": n_manifest - n_train,
                "export_shards": n_shards,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
