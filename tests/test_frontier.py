"""Frontier politeness scheduling (operators/frontier.py): slot
ordering/tie-breaks, host-affine fetcher sharding, budget marking, and
the salted-trim regime's bit-equality on the kept set."""

from __future__ import annotations

import pytest

from claude_readability_hook_spark.operators.frontier import schedule_frontier


def _rows(spark, rows):
    return spark.createDataFrame(rows, "url string, host string, priority long")


def test_slots_offsets_budget(spark):
    df = _rows(
        spark,
        [
            ("https://a/1", "a", 10),
            ("https://a/2", "a", 90),
            ("https://a/3", "a", 90),  # priority tie → url order
            ("https://b/1", "b", 50),
        ],
    )
    out = {r["url"]: r for r in schedule_frontier(df, host_budget=2).collect()}
    assert out["https://a/2"]["slot"] == 0
    assert out["https://a/3"]["slot"] == 1
    assert out["https://a/1"]["slot"] == 2
    assert out["https://a/1"]["keep"] is False
    assert out["https://a/2"]["keep"] is True
    assert out["https://b/1"]["slot"] == 0
    assert out["https://a/3"]["fetch_offset_ms"] == 1000


def test_host_affinity_and_shard_range(spark):
    df = _rows(
        spark, [(f"https://h{i % 5}/p/{i}", f"h{i % 5}", i) for i in range(50)]
    )
    got = schedule_frontier(df, n_fetchers=8).collect()
    by_host = {}
    for r in got:
        assert 0 <= r["fetcher_id"] < 8
        by_host.setdefault(r["host"], set()).add(r["fetcher_id"])
    # a host never spans fetchers — the no-coordination invariant
    assert all(len(v) == 1 for v in by_host.values())


def test_trim_regime_bit_equal_on_kept(spark):
    # one mega-host + small hosts; budget 7, trim over 4 salts
    rows = [(f"https://mega/p/{i:04d}", "mega", (i * 13) % 97) for i in range(200)]
    rows += [(f"https://s{j}/p/{j}", f"s{j}", j) for j in range(6)]
    df = _rows(spark, rows)
    direct = schedule_frontier(df, host_budget=7)
    trimmed = schedule_frontier(df, host_budget=7, trim_salts=4)
    key = lambda r: (r["host"], r["slot"])  # noqa: E731
    a = sorted(map(tuple, direct.filter("keep").collect()), key=lambda t: t[:2])
    b = sorted(map(tuple, trimmed.collect()), key=lambda t: t[:2])
    assert a == b


def test_trim_needs_budget(spark):
    df = _rows(spark, [("https://a/1", "a", 1)])
    with pytest.raises(ValueError):
        schedule_frontier(df, trim_salts=4)


def _mega_mix(spark):
    rows = [(f"https://mega/p/{i:04d}", "mega", (i * 13) % 97) for i in range(200)]
    rows += [(f"https://s{j}/p/{j}", f"s{j}", (j * 7) % 11) for j in range(6)]
    rows += [(f"https://mid/p/{i}", "mid", i) for i in range(12)]
    return _rows(spark, rows)


def test_auto_regime_flips_on_hot_host(spark):
    """Default call (trim_salts='auto'): a host above hot_host_rows is
    detected and routed through the salted two-phase plan — its kept
    rows are bit-equal to the direct plan's keep=true rows and its
    over-budget tail is trimmed; cold hosts keep the direct plan's
    full output INCLUDING the keep=false tail."""
    df = _mega_mix(spark)
    direct = schedule_frontier(df, host_budget=7, trim_salts=None)
    auto = schedule_frontier(df, host_budget=7, hot_host_rows=50)
    d = {r["url"]: tuple(r) for r in direct.collect()}
    a = {r["url"]: tuple(r) for r in auto.collect()}
    # mega (200 rows > 50) is hot: exactly its keep=true rows survive
    mega_direct_kept = {u for u, t in d.items() if u.startswith("https://mega") and t[-1]}
    mega_auto = {u for u in a if u.startswith("https://mega")}
    assert mega_auto == mega_direct_kept
    for u in mega_auto:
        assert a[u] == d[u]
    # cold hosts (mid=12, s*=1 rows ≤ 50): full direct output, tail included
    for u, t in d.items():
        if not u.startswith("https://mega"):
            assert a[u] == t
    assert any(not t[-1] for u, t in a.items() if u.startswith("https://mid"))


def test_auto_regime_cold_path_is_direct(spark):
    """Below the threshold the auto default reproduces the direct
    plan exactly (the sf-scale guarantee the oracle pair rides on)."""
    df = _mega_mix(spark)
    direct = schedule_frontier(df, host_budget=7, trim_salts=None)
    auto = schedule_frontier(df, host_budget=7)  # default 1M threshold
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, auto.collect())
    )


def test_auto_regime_plan_shape(spark):
    """Regime-flip plan evidence: the auto default builds the
    two-regime union with a broadcast hot-host routing join and the
    detection aggregate; trim_salts=None stays a single-window plan
    with no union."""
    import contextlib
    import io

    def plan(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    df = _mega_mix(spark)
    auto = plan(schedule_frontier(df, host_budget=7, hot_host_rows=50))
    direct = plan(schedule_frontier(df, host_budget=7, trim_salts=None))
    assert "Union" in auto and "BroadcastHashJoin" in auto
    assert "HashAggregate" in auto  # the hot-host count detection
    assert "Union" not in direct and "BroadcastHashJoin" not in direct


def test_auto_regime_no_budget_is_direct(spark):
    df = _mega_mix(spark)
    out = schedule_frontier(df)  # auto + no budget → plain direct plan
    assert out.count() == df.count()
    assert all(r["keep"] for r in out.collect())


def test_plan_retries(spark):
    from claude_readability_hook_spark.operators.frontier import plan_retries

    log = spark.createDataFrame(
        [
            # succeeded on the second attempt
            ("https://a/ok", 1, 503), ("https://a/ok", 2, 200),
            # permanent: newest attempt 404
            ("https://a/gone", 1, 404),
            # transient 5xx, 2 attempts → retry with 1000·2² backoff
            ("https://a/flaky", 1, 500), ("https://a/flaky", 2, 502),
            # rate limited (429 is retryable even though it's 4xx)
            ("https://a/slow", 1, 429),
            # network error (status 0) exhausted at 4 attempts
            ("https://a/dead", 1, 0), ("https://a/dead", 2, 0),
            ("https://a/dead", 3, 0), ("https://a/dead", 4, 0),
        ],
        "url string, attempt int, status int",
    )
    out = {r["url"]: r for r in plan_retries(log).collect()}
    assert out["https://a/ok"]["verdict"] == "done"
    assert out["https://a/ok"]["retry_after_ms"] is None
    assert out["https://a/gone"]["verdict"] == "permanent"
    assert out["https://a/flaky"]["verdict"] == "retry"
    assert out["https://a/flaky"]["retry_after_ms"] == 4000
    assert out["https://a/slow"]["verdict"] == "retry"
    assert out["https://a/slow"]["retry_after_ms"] == 2000
    assert out["https://a/dead"]["verdict"] == "exhausted"
    assert out["https://a/dead"]["retry_after_ms"] is None


def test_plan_retries_backoff_cap(spark):
    from claude_readability_hook_spark.operators.frontier import plan_retries

    log = spark.createDataFrame(
        [(f"https://a/x", i, 500) for i in range(1, 8)],
        "url string, attempt int, status int",
    )
    out = plan_retries(log, max_attempts=10).collect()[0]
    # 1000·2⁷ = 128000 clamps to the 60 s ceiling
    assert out["verdict"] == "retry" and out["retry_after_ms"] == 60000
