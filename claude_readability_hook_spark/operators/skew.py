"""Byte-skew-aware repartitioning for the extraction stage.

Extraction cost is ∝ bytes, not rows (SURVEY §4.1). A uniform
``repartition(n)`` hash-partitions by row and leaves byte-skewed
partitions when a few giant documents land together; AQE only fixes
shuffle-read/join skew, not UDF compute skew, so this is explicit:

  - normal docs hash into one of P buckets by doc_id
  - giant docs (n_bytes > threshold) each get their own salt key, so
    the hash partitioner spreads them uniformly instead of letting a
    hot bucket accumulate several

This is the batch analog of the reference's bounded concurrency — its
semaphore(8) kept one slow page from starving the rest
(apps/extractor/app/api.py:15); here one giant page must not starve a
partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig

def span_bytes_expr():
    return F.aggregate(
        "spans",
        F.lit(0).cast("long"),
        lambda acc, s: acc + F.coalesce(F.length(s["text"]).cast("long"), F.lit(0)),
    )


def with_doc_bytes(df: DataFrame) -> DataFrame:
    """Materialize n_bytes from the span array if absent. At ingest this
    should be a stored top-level column (scan pushdown, SURVEY §4);
    computing it here is the fallback for raw span tables."""
    if "n_bytes" in df.columns:
        return df
    return df.withColumn("n_bytes", span_bytes_expr())


def salted_repartition(
    df: DataFrame, num_partitions: int, cfg: EngineConfig = DEFAULT
) -> DataFrame:
    """Repartition so each partition carries a comparable byte load.

    Normal docs: bucket = xxhash64(doc_id) % P  (deterministic, no rand
    — resume-safe). Giants: their own key ⇒ uniform spread by hash."""
    df = with_doc_bytes(df)
    salt = F.when(
        F.col("n_bytes") > cfg.giant_doc_bytes,
        F.concat(F.lit("giant:"), F.col("doc_id")),
    ).otherwise(
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(num_partitions)).cast("string")
    )
    return df.repartition(num_partitions, salt)


def partitions_for(df: DataFrame, cfg: EngineConfig = DEFAULT, minimum: int = 8) -> int:
    """Size the partition count so a partition ≈ target_partition_bytes
    of HTML (one well-sized Arrow batch, SURVEY §4 'bounded concurrency').

    Driver-side single-row agg — cheap (sum pushes down columnar)."""
    df = with_doc_bytes(df)
    total = df.agg(F.sum("n_bytes").alias("b")).collect()[0]["b"] or 0
    return max(minimum, int(total // cfg.target_partition_bytes) + 1)
