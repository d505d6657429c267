"""Count-min sketch (operators/sketch.py): one-sided error, exact
estimates at low collision load, weighted builds, bounded state, and
the hot-key detection property the skew pass relies on."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from claude_readability_hook_spark.operators.sketch import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_build,
    cms_estimate,
    cms_hot_keys,
)

SF_DIR = "/root/testdata/sf0.001"


def test_estimates_one_sided_and_tight_when_sparse(spark):
    """est >= true count ALWAYS; with few distinct keys versus w the
    collision mass is ~0 and estimates are exact."""
    rows = [("a",)] * 50 + [("b",)] * 7 + [("c",)] * 1
    keyed = spark.createDataFrame(rows, "key string")
    sketch = cms_build(keyed)
    cands = spark.createDataFrame([("a",), ("b",), ("c",), ("nope",)], "key string")
    est = {r["key"]: r["est"] for r in cms_estimate(sketch, cands).collect()}
    assert est == {"a": 50, "b": 7, "c": 1, "nope": 0}


def test_one_sided_under_load_vs_exact_counts(spark):
    """Real token stream: every estimate dominates the exact count
    (the CMS guarantee), and the sketch state is ≤ d×w cells no matter
    the vocabulary."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("text")
    keyed = docs.select(
        F.explode(
            F.transform(
                F.filter(F.split("text", r"\s+"), lambda t: t != F.lit("")),
                F.lower,
            )
        ).alias("key")
    )
    sketch = cms_build(keyed)
    assert sketch.count() <= CMS_DEPTH * CMS_WIDTH
    truth = collections.Counter(r["key"] for r in keyed.collect())
    top = spark.createDataFrame(
        [(k,) for k, _ in truth.most_common(50)], "key string"
    )
    est = {r["key"]: r["est"] for r in cms_estimate(sketch, top).collect()}
    for k, e in est.items():
        assert e >= truth[k]


def test_weighted_build_equals_raw_build(spark):
    """Building from a pre-counted (key, n) table equals building from
    the raw stream — cell sums are order- and grouping-independent."""
    rows = [("x",)] * 9 + [("y",)] * 4 + [("z",)] * 2
    raw = spark.createDataFrame(rows, "key string")
    counted = raw.groupBy("key").agg(F.count("*").alias("n"))
    a = sorted(map(tuple, cms_build(raw).collect()))
    b = sorted(map(tuple, cms_build(counted, weight_col="n").collect()))
    assert a == b


def test_hot_keys_catch_every_truly_hot_key(spark):
    """One-sided detection: every key with true count >= threshold is
    in the hot set (collision-inflated extras are allowed — they cost
    an unnecessary salt, never a missed hot key)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("text")
    keyed = docs.select(
        F.explode(
            F.transform(
                F.filter(F.split("text", r"\s+"), lambda t: t != F.lit("")),
                F.lower,
            )
        ).alias("key")
    )
    truth = collections.Counter(r["key"] for r in keyed.collect())
    hot = {r["key"] for r in cms_hot_keys(keyed, threshold=40).collect()}
    truly_hot = {k for k, n in truth.items() if n >= 40}
    assert truly_hot <= hot
