"""RefinedWeb-style URL quality gate (frontier.url_quality): hand-built
URLs tripping each rule, exact feature arithmetic, no-shuffle plan."""

from __future__ import annotations

from claude_readability_hook_spark.operators.frontier import url_quality


def _run(spark, urls, **kw):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return {r["url"]: r for r in url_quality(df, **kw).collect()}


def test_each_rule(spark):
    urls = [
        "https://news.example.com/a/b/c",  # clean → keep
        "https://1234567890-cdn.example.com/x/1",  # digit-heavy host
        "https://a-b-c-d-e.example.com/p/2",  # 4 hyphens in host
        "https://games.example.com/casino/poker/3",  # softban 3+3 >= 3
        "https://deep.example.com" + "/d" * 12 + "/4",  # depth 13 > 8
        "https://long.example.com/" + "x" * 200,  # len > 200
    ]
    out = _run(spark, urls)
    assert out[urls[0]]["keep"] is True
    assert out[urls[0]]["host_digit_micro"] == 0
    assert out[urls[0]]["path_depth"] == 3
    # '1234567890-cdn.example.com': 10 digits / 26 chars →
    # (2·10·10⁶ + 26) div 52 = 384615 micro
    assert out[urls[1]]["host_digit_micro"] == 384615
    assert out[urls[1]]["keep"] is False
    assert out[urls[2]]["host_hyphens"] == 4 and out[urls[2]]["keep"] is False
    assert out[urls[3]]["softban_score"] == 6 and out[urls[3]]["keep"] is False
    assert out[urls[4]]["path_depth"] == 13 and out[urls[4]]["keep"] is False
    assert out[urls[5]]["url_len"] > 200 and out[urls[5]]["keep"] is False


def test_query_params(spark):
    out = _run(
        spark,
        [
            "https://h.example.com/p?a=1&b=2&c=3",  # 1 + 2 '&' = 3
            "https://h.example.com/p",  # no '?' → 0
        ],
    )
    assert out["https://h.example.com/p?a=1&b=2&c=3"]["n_query_params"] == 3
    assert out["https://h.example.com/p"]["n_query_params"] == 0
    # the '?p' part is excluded from the path capture → depth 1
    assert out["https://h.example.com/p?a=1&b=2&c=3"]["path_depth"] == 1


def test_softban_is_case_insensitive(spark):
    out = _run(spark, ["https://x.example.com/CASINO/night"])
    assert out["https://x.example.com/CASINO/night"]["softban_score"] == 3


def test_in_row_plan_no_exchange(spark):
    df = spark.createDataFrame([("https://a.example.com/b",)], "url string")
    plan = url_quality(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
