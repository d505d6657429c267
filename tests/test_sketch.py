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


def test_hot_key_salting_spreads_planted_hot_key(spark):
    """The skew wire (r5 verdict item): plant one hot key, assert its
    rows spread across multiple salts while every cold key keeps
    exactly one stripe (salt 0)."""
    from claude_readability_hook_spark.operators.skew import (
        hot_key_salted_repartition,
        salt_hot_keys,
    )

    rows = [(f"d{i}", "hot") for i in range(400)] + [
        (f"c{i}", f"cold{i % 20}") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id string, key string")
    hot = cms_hot_keys(df.select("key"), threshold=300)
    assert [r["key"] for r in hot.collect()] == ["hot"]

    salted = salt_hot_keys(df, "key", hot, n_salts=8)
    per_key = {
        r["key"]: (r["n_salts"], r["n_rows"])
        for r in salted.groupBy("key")
        .agg(
            F.countDistinct("salt").alias("n_salts"),
            F.count("*").alias("n_rows"),
        )
        .collect()
    }
    assert per_key["hot"][0] > 1 and per_key["hot"][1] == 400
    for k, (n_salts, _n) in per_key.items():
        if k != "hot":
            assert n_salts == 1
    # cold keys carry the constant salt 0
    assert (
        salted.filter((F.col("key") != "hot") & (F.col("salt") != 0)).count() == 0
    )

    # end-to-end: the repartition plan keys on (key, salt) and the hot
    # key's rows land in more than one partition
    rep = hot_key_salted_repartition(df, "key", 16, threshold=300, n_salts=8)
    import pyspark.sql.functions as SF

    parts = (
        rep.withColumn("pid", SF.spark_partition_id())
        .filter(SF.col("key") == "hot")
        .select("pid")
        .distinct()
        .count()
    )
    assert parts > 1


def test_candidate_probe_bounds_the_hot_scan(spark):
    """cms_hot_keys(candidates=...) never distincts the raw keys: a
    caller-supplied candidate set is the only thing probed."""
    rows = [("hot",)] * 200 + [(f"k{i}",) for i in range(50)]
    keyed = spark.createDataFrame(rows, "key string")
    cands = spark.createDataFrame([("hot",), ("k1",)], "key string")
    got = {
        r["key"]: r["est"]
        for r in cms_hot_keys(keyed, threshold=100, candidates=cands).collect()
    }
    assert got == {"hot": 200}


def test_sessionize_auto_routes_and_stays_exact(spark):
    """The CMS consumer: a planted power user routes through the
    salted plan, everyone's counts match plain sessionize exactly."""
    import datetime as dt

    from claude_readability_hook_spark.operators.sessions import (
        sessionize,
        sessionize_auto,
    )

    base = dt.datetime(2026, 1, 1, 23, 0, 0)
    rows = []
    eid = 0
    for day in range(10):
        for i in range(200):
            rows.append(
                ("giant", base + dt.timedelta(days=day, minutes=10 * i), eid)
            )
            eid += 1
    for u in range(30):
        for i in range(40):
            rows.append(
                (f"u{u}", base + dt.timedelta(hours=u, minutes=45 * i), eid)
            )
            eid += 1
    events = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_id long"
    )
    plain = {
        r["user_id"]: (r["n_events"], r["n_sessions"])
        for r in sessionize(events).collect()
    }
    auto = {
        r["user_id"]: (r["n_events"], r["n_sessions"])
        for r in sessionize_auto(events, hot_threshold=1000).collect()
    }
    assert plain == auto
    assert auto["giant"][0] == 2000
