"""Grouped stats: the scale-safe histogram plan must agree bit-for-bit
with the applyInPandas whole-group twin, and its physical plan must be
pure Catalyst aggregation (no Python, no whole-group materialization)."""

from __future__ import annotations

import re

from claude_readability_hook_spark.operators.grouped import (
    per_source_stats,
    per_source_stats_exact,
)


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_histogram_stats_match_grouped_map_twin(spark):
    scale = {r["source"]: tuple(r) for r in per_source_stats(_docs(spark)).collect()}
    exact = {r["source"]: tuple(r) for r in per_source_stats_exact(_docs(spark)).collect()}
    assert scale == exact


def test_histogram_stats_match_on_skewed_groups(spark):
    """One source owning ~all rows must not change correctness (and at
    scale the histogram plan's state is bounded by distinct values)."""
    rows = [("giant", i % 37 + 1) for i in range(5000)] + [
        ("tiny", v) for v in (1, 2, 100)
    ]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    scale = {r["source"]: tuple(r) for r in per_source_stats(df).collect()}
    exact = {r["source"]: tuple(r) for r in per_source_stats_exact(df).collect()}
    assert scale == exact
    # tiny = [1, 2, 100]: p50 at h=1 → 2.0; p90 at h=1.8 → 2 + 0.8·98 = 80.4
    assert scale["tiny"][1:] == (3, 2.0, 80.4, 100)


def test_histogram_plan_has_no_python_and_partial_agg(spark):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        per_source_stats(_docs(spark)).explain("formatted")
    plan = buf.getvalue()
    assert "FlatMapGroupsInPandas" not in plan and "ArrowEvalPython" not in plan
    # histogram agg must partial-aggregate map-side before its shuffle
    assert re.search(r"HashAggregate .*\n(?:.*\n)*?.*Exchange", plan)
    assert "partial_count" in plan or "partial_sum" in plan or "Partial" in plan
