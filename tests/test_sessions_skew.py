"""Skew-safe sessionization: sessionize_salted must equal sessionize
exactly (boundary reconciliation), split a dominant user across
time-bucket stripes in the physical plan, and handle the edge cases
bucket boundaries create."""

from __future__ import annotations

import datetime as dt
import re

from claude_readability_hook_spark.operators.sessions import sessionize, sessionize_salted


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_salted_matches_plain_on_events_table(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plain = {r["user_id"]: (r["n_events"], r["n_sessions"]) for r in sessionize(events).collect()}
    salted = {
        r["user_id"]: (r["n_events"], r["n_sessions"])
        for r in sessionize_salted(events).collect()
    }
    assert plain == salted


def test_salted_matches_plain_under_heavy_skew(spark):
    """One user owns 50% of events spread over many days; sessions that
    span midnight boundaries must merge exactly."""
    base = dt.datetime(2026, 1, 1, 23, 0, 0)
    rows = []
    eid = 0
    # giant user: bursts that CROSS midnight (10-min steps, gap 30 min)
    for day in range(20):
        for i in range(250):
            rows.append(("giant", base + dt.timedelta(days=day, minutes=10 * i), eid))
            eid += 1
    # normal users
    for u in range(50):
        for i in range(100):
            rows.append((f"u{u}", base + dt.timedelta(hours=u, minutes=45 * i), eid))
            eid += 1
    events = spark.createDataFrame(rows, "user_id string, ts timestamp, event_id long")
    plain = {r["user_id"]: (r["n_events"], r["n_sessions"]) for r in sessionize(events).collect()}
    salted = {
        r["user_id"]: (r["n_events"], r["n_sessions"])
        for r in sessionize_salted(events).collect()
    }
    assert plain == salted
    assert plain["giant"][0] == 5000


def test_boundary_cases_exact(spark):
    """Gaps exactly at / just over the threshold across a bucket edge."""
    rows = [
        # session continues across midnight (gap 20 min < 30)
        ("a", dt.datetime(2026, 1, 1, 23, 50), 1),
        ("a", dt.datetime(2026, 1, 2, 0, 10), 2),
        # break exactly at threshold is NOT a break (strict >)
        ("b", dt.datetime(2026, 1, 1, 23, 0), 3),
        ("b", dt.datetime(2026, 1, 1, 23, 30), 4),
        # break across midnight (gap 40 min > 30)
        ("c", dt.datetime(2026, 1, 1, 23, 50), 5),
        ("c", dt.datetime(2026, 1, 2, 0, 30), 6),
    ]
    events = spark.createDataFrame(rows, "user_id string, ts timestamp, event_id long")
    out = {r["user_id"]: r["n_sessions"] for r in sessionize_salted(events).collect()}
    assert out == {"a": 1, "b": 1, "c": 2}
    plain = {r["user_id"]: r["n_sessions"] for r in sessionize(events).collect()}
    assert plain == out


def test_salted_window_keys_on_user_and_bucket(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = _plan(sessionize_salted(events))
    # the event-level window's exchange must include the time bucket —
    # that IS the giant-key split
    assert re.search(r"hashpartitioning\(user_id[^)]*bkt", plan), plan
