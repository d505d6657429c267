"""HyperLogLog sketch: register mergeability, estimate accuracy
envelope, and exact dyadic determinism across repeated runs."""

from __future__ import annotations

from pyspark.sql import functions as F

from claude_readability_hook_spark.operators.sketch import (
    HLL_M,
    hll_distinct,
    hll_estimate,
    hll_registers,
)


def _keys(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("w")
    )


def test_estimate_within_hll_error_envelope(spark):
    """m=64 → standard error ~1.04/√64 = 13%; allow 3σ on a single
    draw plus the raw estimator's high bias at n >> m."""
    out = hll_distinct(_keys(spark, 0, 5000), "w").collect()[0]
    assert out["m"] == HLL_M
    assert out["exact_distinct"] == 5000
    assert out["nonzero_registers"] == HLL_M  # 5000 keys fill 64 buckets
    assert 0.55 * 5000 <= out["estimate"] <= 1.6 * 5000, out["estimate"]


def test_registers_merge_by_max(spark):
    """Sketch state is mergeable: max-combining the register tables of
    two disjoint halves equals the union's registers — the property
    that makes HLL shard-parallel at 100 TB."""
    a = hll_registers(_keys(spark, 0, 800), "w")
    b = hll_registers(_keys(spark, 800, 1600), "w")
    merged = (
        a.unionByName(b)
        .groupBy("bucket")
        .agg(F.max("register").alias("register"))
    )
    union = hll_registers(_keys(spark, 0, 1600), "w")
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in union.collect()
    }
    # and the merged estimate is the union estimate, bit-for-bit
    e1 = hll_estimate(merged).collect()[0]["estimate"]
    e2 = hll_estimate(union).collect()[0]["estimate"]
    assert e1 == e2


def test_duplicates_do_not_move_registers(spark):
    once = hll_registers(_keys(spark, 0, 300), "w")
    thrice = hll_registers(
        _keys(spark, 0, 300)
        .unionByName(_keys(spark, 0, 300))
        .unionByName(_keys(spark, 0, 300)),
        "w",
    )
    assert {tuple(r) for r in once.collect()} == {
        tuple(r) for r in thrice.collect()
    }
