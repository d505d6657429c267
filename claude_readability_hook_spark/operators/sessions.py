"""Event sessionization (gap-based) — the windowed-analytics operator
the events table exists for.

A session breaks when the gap to the previous event of the same user
exceeds `gap` seconds. One shuffle on user_id; the window runs inside
each partition (no second exchange — partitionBy matches the shuffle
key). At 10^12 events the same plan holds; skewed power-users would get
the giant-key treatment from operators/skew.py.
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
