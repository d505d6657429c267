"""Event sessionization (gap-based) — the windowed-analytics operator
the events table exists for.

A session breaks when the gap to the previous event of the same user
exceeds `gap` seconds. Two implementations, identical output:

  sessionize         one shuffle on user_id; the window runs inside
                     each partition (partitionBy matches the shuffle
                     key). Right when no single user dominates.
  sessionize_salted  the giant-key treatment: the window keys on
                     (user_id, time-bucket) so a power user owning half
                     the events splits into per-bucket stripes bounded
                     by event rate × bucket width, then stripes merge
                     exactly via boundary reconciliation — a break at a
                     bucket edge counts only when the cross-boundary
                     gap exceeds `gap`. The merge window runs over
                     BUCKETS per user (tiny), never events. Exactness
                     is differential-tested against sessionize.
  sessionize_auto    DETECTS which treatment each user needs: the
                     count-min sketch (operators/sketch.cms_hot_keys —
                     bounded d×w state) flags users whose event count
                     clears a threshold; flagged users run the salted
                     plan, the long tail runs the plain window, results
                     union. The sketch's production consumer — no
                     per-key exact pre-count, no blanket fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """(user_id, n_events, n_sessions) with deterministic ordering
    (ts, event_id tiebreak)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # interval arithmetic: timezone-free (ts may be TIMESTAMP_NTZ, which
    # has no epoch cast), identical semantics in any SQL engine
    gapped = events.withColumn(
        "new_session",
        (
            F.col("ts") - F.lag("ts").over(w)
            > F.expr(f"INTERVAL {gap_seconds} SECONDS")
        ).cast("int"),
    )
    return gapped.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        (F.coalesce(F.sum("new_session"), F.lit(0)) + 1).cast("long").alias("n_sessions"),
    )


def sessionize_salted(
    events: DataFrame, gap_seconds: int = 1800, bucket: str = "day"
) -> DataFrame:
    """Skew-safe exact sessionization: per-(user, time-bucket) partial
    sessions + per-user boundary merge.

    Stage 1 windows over (user_id, date_trunc(bucket, ts)) — the salted
    key; a dominant user's events spread across as many tasks as they
    span buckets. Stage 2 aggregates one ROW PER BUCKET per user
    (n_events, internal breaks, first/last ts) and reconciles
    boundaries with a window over those bucket rows — data volume is
    users × buckets, independent of event count. date_trunc keeps
    TIMESTAMP_NTZ semantics (no epoch cast)."""
    bkt = F.date_trunc(bucket, F.col("ts"))
    w = Window.partitionBy("user_id", "bkt").orderBy("ts", "event_id")
    gapped = events.withColumn("bkt", bkt).withColumn(
        "new_session",
        (
            F.col("ts") - F.lag("ts").over(w)
            > F.expr(f"INTERVAL {gap_seconds} SECONDS")
        ).cast("int"),
    )
    per_bucket = gapped.groupBy("user_id", "bkt").agg(
        F.count("*").alias("n_events"),
        F.coalesce(F.sum("new_session"), F.lit(0)).alias("breaks"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )
    wb = Window.partitionBy("user_id").orderBy("bkt")
    merged = per_bucket.withColumn(
        "boundary_break",
        (
            F.col("first_ts") - F.lag("last_ts").over(wb)
            > F.expr(f"INTERVAL {gap_seconds} SECONDS")
        ).cast("int"),
    )
    return merged.groupBy("user_id").agg(
        F.sum("n_events").cast("long").alias("n_events"),
        (
            F.sum("breaks") + F.coalesce(F.sum("boundary_break"), F.lit(0)) + 1
        ).cast("long").alias("n_sessions"),
    )


def sessionize_auto(
    events: DataFrame,
    gap_seconds: int = 1800,
    hot_threshold: int = 10_000,
    bucket: str = "day",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Skew-routing sessionization: probe the count-min sketch for
    users whose event count clears `hot_threshold` (one-sided — every
    truly-hot user is caught; a collision-inflated cold user only pays
    the salted plan's extra agg), then run detected hot users through
    sessionize_salted and the long tail through the plain window.
    Results are exact either way (the salted plan is
    differential-tested), so routing changes only the physical plan:
    tail users avoid the two-stage overhead, hot users never serialize
    one window partition. The hot set broadcasts into both branch
    filters (≤ total_events/hot_threshold keys by construction).
    `candidates` forwards to cms_hot_keys — pass a bounded sample at
    scale instead of the distinct-keys default."""
    from .sketch import cms_hot_keys

    hot = cms_hot_keys(
        events.select(F.col("user_id").alias("key")),
        threshold=hot_threshold,
        candidates=candidates,
    ).select(F.col("key").alias("user_id"))
    hot_b = F.broadcast(hot)
    hot_events = events.join(hot_b, "user_id", "left_semi")
    cold_events = events.join(hot_b, "user_id", "left_anti")
    return sessionize(cold_events, gap_seconds).unionByName(
        sessionize_salted(hot_events, gap_seconds, bucket)
    )
