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
        # column may exist but be unpopulated (raw ingest) — fill nulls
        return df.withColumn("n_bytes", F.coalesce(F.col("n_bytes"), span_bytes_expr()))
    return df.withColumn("n_bytes", span_bytes_expr())


def salted_repartition(
    df: DataFrame, num_partitions: int, cfg: EngineConfig = DEFAULT
) -> DataFrame:
    """Repartition so each partition carries a comparable byte load.

    Both classes hash on the FULL-WIDTH xxhash64(doc_id) — deterministic
    (no rand ⇒ resume-safe) and continuous. Quantizing the key to
    num_partitions values first (the obvious 'bucket = hash % P') is a
    trap: hashing 128 distinct bucket values into 128 partitions leaves
    ~1/e of partitions empty and stacks 3-5 buckets on others (measured:
    74/128 occupied, 5× doc skew). A continuous key makes per-partition
    load Poisson-concentrated (±4% at 625 docs/partition).

    Giants (n_bytes > threshold) go through their own shuffle so a
    giant never lands on top of a full normal partition: the giant
    branch's partitions hold only giants (0-3 each at a <1% giant
    rate), bounding byte-load variance without counting them first
    (a count would be an extra full scan at 10^12 rows; empty giant
    partitions cost nothing). Union of the two shuffles = the
    extraction stage reads 2×num_partitions tasks, half of them tiny."""
    df = with_doc_bytes(df)
    is_giant = F.col("n_bytes") > cfg.giant_doc_bytes
    key = F.xxhash64(F.col("doc_id"))
    normals = df.filter(~is_giant).repartition(num_partitions, key)
    giants = df.filter(is_giant).repartition(num_partitions, key)
    return normals.unionByName(giants)


def partitions_for(df: DataFrame, cfg: EngineConfig = DEFAULT, minimum: int = 8) -> int:
    """Size the partition count so a partition ≈ target_partition_bytes
    of HTML (one well-sized Arrow batch, SURVEY §4 'bounded concurrency').

    Driver-side single-row agg — cheap (sum pushes down columnar)."""
    df = with_doc_bytes(df)
    total = df.agg(F.sum("n_bytes").alias("b")).collect()[0]["b"] or 0
    return max(minimum, int(total // cfg.target_partition_bytes) + 1)
