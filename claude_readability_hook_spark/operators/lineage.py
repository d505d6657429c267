"""Per-partition lineage + metrics rollup (north_rule requirement).

Replaces the reference's Prometheus counters/histograms
(lib/metrics.ts:23-82, app/services/metrics.py:5-36) with a lineage
TABLE: one row per (run_id, partition_id) summarizing docs, bytes,
failures, wall time and the engine histogram. The extraction UDF
stamps partition_id/bytes_in/udf_wall_ms on every row; this groupBy is
a cheap narrow-column agg over the already-materialized output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lineage_rollup(extracted_with_metrics: DataFrame, run_id: str) -> DataFrame:
    return (
        extracted_with_metrics.groupBy("partition_id")
        .agg(
            F.count("*").alias("docs_in"),
            F.sum(F.when(F.col("success"), 1).otherwise(0)).alias("docs_out"),
            F.sum("bytes_in").alias("bytes_in"),
            F.sum(F.when(~F.col("success"), 1).otherwise(0)).alias("failures"),
            F.sum("udf_wall_ms").alias("wall_ms"),
            F.sum(F.when(F.col("engine") == "precision", 1).otherwise(0)).alias(
                "engine_precision"
            ),
            F.sum(F.when(F.col("engine") == "recall", 1).otherwise(0)).alias("engine_recall"),
            F.sum(F.when(F.col("engine") == "so-api", 1).otherwise(0)).alias("engine_so"),
            F.sum(F.when(F.col("engine") == "reddit-json", 1).otherwise(0)).alias(
                "engine_reddit"
            ),
        )
        .select(
            F.lit(run_id).alias("run_id"),
            F.col("partition_id"),
            F.col("docs_in"),
            F.col("docs_out"),
            F.col("bytes_in"),
            F.col("failures"),
            F.col("wall_ms"),
            F.col("engine_precision"),
            F.col("engine_recall"),
            F.col("engine_so"),
            F.col("engine_reddit"),
        )
    )
