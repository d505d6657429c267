"""robots.txt parsing + gate (frontier.parse_robots / robots_gate):
section isolation, directive edge cases, Google longest-match
precedence."""

from __future__ import annotations

from claude_readability_hook_spark.operators.frontier import (
    parse_robots,
    robots_gate,
)

BODY = (
    "User-agent: evil\nDisallow: /\n\n"
    "User-agent: *\n"
    "Disallow: /private\n"
    "Allow: /private/open\n"
    "DISALLOW: /p\n"  # directive matching is case-insensitive
    "Disallow:\n\n"  # empty prefix = allow-all no-op → dropped
    "User-agent: other\nAllow: /\n"
)


def _rules(spark, rows):
    df = spark.createDataFrame(rows, "host string, robots_txt string")
    return parse_robots(df)


def test_parse_section_isolation(spark):
    out = _rules(spark, [("h0", BODY)]).collect()
    got = {(r["allow"], r["path_prefix"]) for r in out}
    # only the wildcard section's non-empty rules survive
    assert got == {
        (False, "/private"),
        (True, "/private/open"),
        (False, "/p"),
    }
    orders = {r["path_prefix"]: r["rule_order"] for r in out}
    assert orders["/private"] == 1 and orders["/p"] == 3


def test_parse_no_wildcard_section(spark):
    out = _rules(spark, [("h0", "User-agent: bot\nDisallow: /")]).collect()
    assert out == []


def test_parse_repeated_agent_value(spark):
    """An agent line repeated BEFORE and AFTER the wildcard section —
    the value-lookup bound resolved the next-section index to the
    FIRST occurrence (before the section), producing a negative slice
    length and a runtime abort. Positional bounds parse it cleanly."""
    body = (
        "User-agent: evil\nDisallow: /\n"
        "User-agent: *\nDisallow: /private\nAllow: /open\n"
        "User-agent: evil\nDisallow: /secret\n"
    )
    out = _rules(spark, [("h0", body)]).collect()
    got = {(r["allow"], r["path_prefix"]) for r in out}
    assert got == {(False, "/private"), (True, "/open")}


def test_parse_wildcard_whitespace_variants(spark):
    """'User-agent:*' (no space) and 'User-agent:   *' (multi-space)
    declare the same wildcard section — the exact-string match treated
    them as section-absent and silently dropped every rule."""
    for ua in ("User-agent:*", "User-agent:   *", "user-agent:\t*"):
        out = _rules(
            spark, [("h0", f"{ua}\nDisallow: /private\nUser-agent: other\nAllow: /")]
        ).collect()
        assert {(r["allow"], r["path_prefix"]) for r in out} == {
            (False, "/private")
        }, ua


def test_gate_precedence(spark):
    rules = _rules(spark, [("h0.example.com", BODY)])
    urls = spark.createDataFrame(
        [(u,) for u in [
            "https://h0.example.com/p/1",
            "https://h0.example.com/private/x",
            "https://h0.example.com/private/open/y",
            "https://h0.example.com/q/free",
            "https://unlisted.example.com/a",
        ]],
        "url string",
    )
    out = {r["url"]: r for r in robots_gate(urls, rules).collect()}
    assert out["https://h0.example.com/p/1"]["allowed"] is False
    assert out["https://h0.example.com/private/x"]["allowed"] is False
    # longer Allow overrides shorter Disallow — the Google rule
    assert out["https://h0.example.com/private/open/y"]["allowed"] is True
    assert (
        out["https://h0.example.com/private/open/y"]["matched_prefix"]
        == "/private/open"
    )
    # no match and no rules at all both default to allowed
    assert out["https://h0.example.com/q/free"]["allowed"] is True
    assert out["https://unlisted.example.com/a"]["allowed"] is True
    assert out["https://unlisted.example.com/a"]["matched_prefix"] == ""


def test_gate_allow_wins_length_tie(spark):
    rules = _rules(
        spark,
        [("h0", "User-agent: *\nDisallow: /dir\nAllow: /di2")],
    )
    # craft a same-length tie by matching both prefixes is impossible
    # for distinct prefixes of one path, so test the tie rule directly:
    # identical prefix both allowed and disallowed
    rules2 = _rules(
        spark,
        [("h0", "User-agent: *\nDisallow: /dir\nAllow: /dir")],
    )
    urls = spark.createDataFrame(
        [("https://h0/dir/page",)], "url string"
    )
    out = robots_gate(urls, rules2).collect()[0]
    assert out["allowed"] is True  # allow wins the tie
    _ = rules


def test_gate_query_and_scheme_case(spark):
    """Rules match path+QUERY ('Disallow: /search?q=' is a real
    pattern) and the scheme match is case-insensitive — an uppercase
    'HTTPS://' URL must not bypass the gate on an empty host/path."""
    rules = _rules(
        spark,
        [("h0.example.com", "User-agent: *\nDisallow: /search?q=\nDisallow: /p")],
    )
    urls = spark.createDataFrame(
        [(u,) for u in [
            "https://h0.example.com/search?q=spam",
            "https://h0.example.com/search",          # query rule: no match
            "HTTPS://h0.example.com/p/1",             # uppercase scheme
            "https://h0.example.com/a#frag",          # fragment excluded
        ]],
        "url string",
    )
    out = {r["url"]: r for r in robots_gate(urls, rules).collect()}
    assert out["https://h0.example.com/search?q=spam"]["allowed"] is False
    assert (
        out["https://h0.example.com/search?q=spam"]["matched_prefix"]
        == "/search?q="
    )
    assert out["https://h0.example.com/search"]["allowed"] is True
    assert out["HTTPS://h0.example.com/p/1"]["allowed"] is False
    assert out["HTTPS://h0.example.com/p/1"]["host"] == "h0.example.com"
    assert out["https://h0.example.com/a#frag"]["allowed"] is True


def test_gate_shuffle_regime_matches(spark):
    rules = _rules(spark, [("h0.example.com", BODY)])
    urls = spark.createDataFrame(
        [(f"https://h0.example.com/p/{i}",) for i in range(20)]
        + [(f"https://h0.example.com/private/open/{i}",) for i in range(20)],
        "url string",
    )
    a = sorted(map(tuple, robots_gate(urls, rules).collect()))
    b = sorted(
        map(tuple, robots_gate(urls, rules, broadcast_rules=False).collect())
    )
    assert a == b


def test_crawl_delays_and_schedule(spark):
    from claude_readability_hook_spark.operators.frontier import (
        parse_crawl_delays,
        schedule_frontier_with_delays,
    )

    robots = spark.createDataFrame(
        [
            ("slow", "User-agent: *\nCrawl-delay: 5\nDisallow: /x"),
            ("fast", "User-agent: *\nDisallow: /x"),  # no directive → default
            ("junk", "User-agent: *\nCrawl-delay: soon"),  # garbage → default
            ("decoy", "User-agent: bot\nCrawl-delay: 9"),  # other agent → default
        ],
        "host string, robots_txt string",
    )
    d = {r["host"]: r["delay_ms"] for r in parse_crawl_delays(robots).collect()}
    assert d == {"slow": 5000, "fast": 1000, "junk": 1000, "decoy": 1000}

    urls = spark.createDataFrame(
        [(f"https://slow/p/{i}", "slow", i) for i in range(3)]
        + [(f"https://fast/p/{i}", "fast", i) for i in range(3)],
        "url string, host string, priority long",
    )
    out = {
        (r["host"], r["slot"]): r["fetch_offset_ms"]
        for r in schedule_frontier_with_delays(
            urls, parse_crawl_delays(robots)
        ).collect()
    }
    assert out[("slow", 2)] == 10000  # slot 2 × 5 s
    assert out[("fast", 2)] == 2000  # slot 2 × default 1 s


def test_parse_sitemaps(spark):
    from claude_readability_hook_spark.operators.frontier import parse_sitemaps

    xml = (
        '<?xml version="1.0"?>\n<urlset>\n'
        "  <url>\n    <loc>https://h0/a</loc>\n"
        "    <lastmod>2024-01-02</lastmod>\n"
        "    <priority>0.8</priority>\n  </url>\n"
        "  <url><loc>https://h0/b</loc><priority>1.0</priority></url>\n"
        "  <url><loc>https://h0/c</loc><priority>garbage</priority></url>\n"
        "  <url><loc>https://h0/d</loc></url>\n"
        "  <url><lastmod>2024-05-05</lastmod></url>\n"  # no loc → dropped
        "</urlset>"
    )
    df = spark.createDataFrame([("h0", xml)], "host string, sitemap_xml string")
    out = {r["url"]: r for r in parse_sitemaps(df).collect()}
    assert set(out) == {"https://h0/a", "https://h0/b", "https://h0/c", "https://h0/d"}
    assert out["https://h0/a"]["priority_micro"] == 800000
    assert out["https://h0/a"]["lastmod"] == "2024-01-02"
    assert out["https://h0/b"]["priority_micro"] == 1000000
    assert out["https://h0/c"]["priority_micro"] == 500000  # garbage → default
    assert out["https://h0/d"]["priority_micro"] == 500000  # absent → default
    assert out["https://h0/d"]["lastmod"] == ""


def test_sitemap_feeds_frontier(spark):
    from claude_readability_hook_spark.operators.frontier import (
        parse_sitemaps,
        schedule_frontier,
    )

    xml = (
        "<urlset>"
        "<url><loc>https://h0/hi</loc><priority>0.9</priority></url>"
        "<url><loc>https://h0/lo</loc><priority>0.1</priority></url>"
        "</urlset>"
    )
    df = spark.createDataFrame([("h0", xml)], "host string, sitemap_xml string")
    cand = parse_sitemaps(df).withColumnRenamed("priority_micro", "priority")
    out = {r["url"]: r["slot"] for r in schedule_frontier(cand).collect()}
    assert out["https://h0/hi"] == 0  # higher sitemap priority fetches first
    assert out["https://h0/lo"] == 1


def test_delays_compose_with_trim_salts(spark):
    from claude_readability_hook_spark.operators.frontier import (
        schedule_frontier_with_delays,
    )

    urls = spark.createDataFrame(
        [(f"https://big/p/{i:03d}", "big", i % 10) for i in range(40)],
        "url string, host string, priority long",
    )
    delays = spark.createDataFrame([("big", 3000)], "host string, delay_ms long")
    direct = schedule_frontier_with_delays(urls, delays, host_budget=8)
    trimmed = schedule_frontier_with_delays(
        urls, delays, host_budget=8, trim_salts=4
    )
    keep_direct = sorted(
        map(tuple, direct.filter("keep").collect())
    )
    keep_trim = sorted(map(tuple, trimmed.collect()))
    assert keep_trim == keep_direct  # bit-equal kept rows, per-host delay
    assert all(r[4] == r[3] * 3000 for r in keep_trim)  # offset = slot×3s


def test_parse_sitemap_urls(spark):
    from claude_readability_hook_spark.operators.frontier import (
        parse_sitemap_urls,
    )

    body = (
        "Sitemap: https://h0/sitemap.xml\n"      # global, before any section
        "User-agent: bot\nDisallow: /\n"
        "sitemap:https://h0/sm2.xml\n"           # case + no space
        "User-agent: *\nDisallow: /x\n"
        "Sitemap: HTTP://h0/SM3.xml\n"           # inside wildcard section
        "Sitemap: /relative/ignored.xml\n"       # not absolute → dropped
        "Sitemap:\n"                             # empty → dropped
    )
    out = {
        r["sitemap_url"]
        for r in parse_sitemap_urls(
            spark.createDataFrame([("h0", body)], "host string, robots_txt string")
        ).collect()
    }
    assert out == {
        "https://h0/sitemap.xml",
        "https://h0/sm2.xml",
        "HTTP://h0/SM3.xml",
    }
