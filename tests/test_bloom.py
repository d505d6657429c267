"""Bloom seen-set gate: no false negatives, plausible false-positive
rate, sparse word table, and build/probe parameter coupling."""

from __future__ import annotations

from pyspark.sql import functions as F

from claude_readability_hook_spark.operators.bloom import (
    build_bloom,
    probe_bloom,
)


def _urls(spark, lo, hi, name="url"):
    return spark.range(lo, hi).select(
        F.concat(F.lit("https://u/"), F.col("id").cast("string")).alias(name)
    )


def test_no_false_negatives_and_fp_rate(spark):
    seen = _urls(spark, 0, 400)
    bloom = build_bloom(seen)
    probes = _urls(spark, 0, 1000)
    out = probe_bloom(bloom, probes).collect()
    flags = {r["url"]: r["maybe_seen"] for r in out}
    for i in range(400):
        assert flags[f"https://u/{i}"], "false negative — contract broken"
    # k=4, n=400, m=65536: expected fp ≈ (1-e^{-kn/m})^4 ≈ 3e-5 — on
    # 600 novel probes essentially zero; allow a small margin
    fps = sum(flags[f"https://u/{i}"] for i in range(400, 1000))
    assert fps <= 3, fps


def test_word_table_sparse_and_bounded(spark):
    bloom = build_bloom(_urls(spark, 0, 50))
    rows = bloom.collect()
    assert 0 < len(rows) <= 65_536 // 32
    # 50 keys * 4 bits → at most 200 set bits across all words
    total_bits = sum(bin(r["bits"] & ((1 << 64) - 1)).count("1") for r in rows)
    assert 0 < total_bits <= 200


def test_probe_preserves_columns_and_small_m_saturates(spark):
    """A deliberately tiny filter saturates: every probe reads
    maybe_seen — the false-positive failure mode, never a negative."""
    seen = _urls(spark, 0, 300)
    bloom = build_bloom(seen, m_bits=64, k=2)
    probes = _urls(spark, 0, 350).withColumn("extra", F.lit(7))
    out = probe_bloom(bloom, probes, m_bits=64, k=2)
    assert set(out.columns) == {"url", "extra", "maybe_seen"}
    assert all(r["maybe_seen"] for r in out.collect())
