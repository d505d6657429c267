"""Skew machinery tests (SURVEY §5.3.5): giant docs must not stack on
full partitions; per-partition byte load stays bounded."""

from __future__ import annotations

from pyspark.sql import functions as F

from claude_readability_hook_spark.config import EngineConfig
from claude_readability_hook_spark.operators.skew import (
    partitions_for,
    salted_repartition,
    with_doc_bytes,
)
from claude_readability_hook_spark.schemas import DOCUMENTS


def _corpus_with_giants(spark, n_normal=400, n_giant=8):
    rows = []
    for i in range(n_normal):
        rows.append(
            {
                "doc_id": f"n{i}",
                "url": None,
                "host": None,
                "n_bytes": None,
                "spans": [{"kind": "text", "text": "word " * 200, "media_ref": "", "offset": 0}],
            }
        )
    for i in range(n_giant):
        rows.append(
            {
                "doc_id": f"g{i}",
                "url": None,
                "host": None,
                "n_bytes": None,
                "spans": [
                    {"kind": "text", "text": "giant " * 40000, "media_ref": "", "offset": 0}
                ],
            }
        )
    return spark.createDataFrame(rows, schema=DOCUMENTS)


def test_n_bytes_derived_from_spans(spark):
    df = with_doc_bytes(_corpus_with_giants(spark, 5, 1))
    rows = {r["doc_id"]: r["n_bytes"] for r in df.collect()}
    assert rows["n0"] == 1000
    assert rows["g0"] == 240000


def test_giants_never_share_partition_with_full_normal_load(spark):
    cfg = EngineConfig(giant_doc_bytes=100_000)
    df = _corpus_with_giants(spark)
    parts = salted_repartition(df, 8, cfg)
    dist = (
        parts.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            F.sum("n_bytes").alias("part_bytes"),
            F.sum(F.when(F.col("n_bytes") > 100_000, 1).otherwise(0)).alias("giants"),
            F.sum(F.when(F.col("n_bytes") <= 100_000, 1).otherwise(0)).alias("normals"),
        )
        .collect()
    )
    # giants travel through their own shuffle: any partition with a giant
    # holds no normals and vice versa
    for r in dist:
        assert r["giants"] == 0 or r["normals"] == 0, r
    # normal-doc partitions stay balanced (continuous hash keys: no
    # empty-bin pathology)
    normal_parts = [r for r in dist if r["normals"] > 0]
    assert len(normal_parts) == 8
    counts = [r["normals"] for r in normal_parts]
    assert max(counts) <= 2.5 * (400 / 8)


def test_partitions_for_scales_with_bytes(spark):
    cfg = EngineConfig(target_partition_bytes=100_000)
    df = _corpus_with_giants(spark, n_normal=400, n_giant=8)
    n = partitions_for(df, cfg)
    # ~2.3 MB total / 100 KB target ≈ 24 partitions
    assert 20 <= n <= 32


def test_determinism_same_input_same_partitioning(spark):
    cfg = EngineConfig(giant_doc_bytes=100_000)
    df = _corpus_with_giants(spark, 50, 2)
    a = salted_repartition(df, 4, cfg).withColumn("pid", F.spark_partition_id())
    b = salted_repartition(df, 4, cfg).withColumn("pid", F.spark_partition_id())
    ma = {r["doc_id"]: r["pid"] for r in a.collect()}
    mb = {r["doc_id"]: r["pid"] for r in b.collect()}
    assert ma == mb  # resume-safe: no rand() in the salt
