"""Corpus drift between two snapshots: per-token unigram-rate deltas
and the total-variation distance — the monitoring operator a recurring
crawl pipeline runs between snapshot N and N+1 before retraining
(sudden drift = a scraper regression, a spam flood, or a source going
dark; public crawl reports — e.g. Common Crawl's per-snapshot stats —
track exactly these distribution shifts).

Why total variation and not KL: TV = ½ Σ|p_a − p_b| needs no
logarithm, so the whole computation stays in exact integer micro-units
(the libm-free oracle rule) — per-token rates are half-up micro-rates
of each snapshot's token total, and the global distance is an integer
sum over the vocabulary.

Scale shape: each side collapses to a vocabulary-bounded (token,
count) table in one map-side-combined hash agg — document text is
scanned once per side and never shuffles; the full-outer join and the
TV sum run on vocab-sized tables, and the top-k report is a
TakeOrdered (no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .lmfilter import _lower_tokens


def unigram_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, n): lowercased whitespace-token counts — the snapshot's
    unigram table."""
    return (
        df.select(F.explode(_lower_tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("n"))
    )


def _micro(n: Column, total: Column) -> Column:
    return F.expr(
        f"(2 * ({n}) * 1000000 + greatest({total}, 1))"
        f" div (2 * greatest({total}, 1))"
    ).cast("long")


def corpus_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
    top_k: int = 50,
) -> DataFrame:
    """Top-k drifted tokens between snapshots A and B:

      (token, n_a, n_b, pa_micro, pb_micro, drift_micro, tv_micro)

    drift_micro = |pa − pb| in micro-units; tv_micro = ½ Σ drift over
    the FULL vocabulary (the same value on every row — the headline
    distance travels with its evidence). Ranking is total-ordered
    (drift desc, token asc), so the k-boundary is deterministic."""
    ca = unigram_counts(df_a, text_col)
    cb = unigram_counts(df_b, text_col)
    joined = (
        ca.withColumnRenamed("n", "n_a")
        .join(cb.withColumnRenamed("n", "n_b"), "token", "full_outer")
        .select(
            "token",
            F.coalesce("n_a", F.lit(0)).cast("long").alias("n_a"),
            F.coalesce("n_b", F.lit(0)).cast("long").alias("n_b"),
        )
    )
    totals = joined.agg(
        F.sum("n_a").cast("long").alias("ta"),
        F.sum("n_b").cast("long").alias("tb"),
    )
    rated = joined.crossJoin(F.broadcast(totals)).select(
        "token",
        "n_a",
        "n_b",
        _micro("n_a", "ta").alias("pa_micro"),
        _micro("n_b", "tb").alias("pb_micro"),
    )
    drifted = rated.withColumn(
        "drift_micro",
        F.abs(F.col("pa_micro") - F.col("pb_micro")).cast("long"),
    )
    tv = drifted.agg(
        F.expr("sum(drift_micro) div 2").cast("long").alias("tv_micro")
    )
    return (
        drifted.orderBy(F.desc("drift_micro"), F.asc("token"))
        .limit(top_k)
        .crossJoin(F.broadcast(tv))
    )
