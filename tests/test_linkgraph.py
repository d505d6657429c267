"""Domain PageRank (operators/linkgraph.py): analytic fixtures — a
cycle (uniform by symmetry), a star (closed-form), dangling-mass
conservation, and edge-collapsing rules."""

from __future__ import annotations

import pytest

from claude_readability_hook_spark.operators.linkgraph import domain_pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _ranks(spark, pairs, **kw):
    return {
        r["domain"]: r["rank"]
        for r in domain_pagerank(_edges(spark, pairs), **kw).collect()
    }


def test_cycle_is_uniform(spark):
    r = _ranks(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    assert r["a"] == pytest.approx(1 / 3, abs=1e-12)
    assert r["b"] == pytest.approx(1 / 3, abs=1e-12)
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-9)


def test_star_closed_form(spark):
    # leaves a,b,c each link only to hub; hub links only to a.
    # Exact fixed point (d=0.85, base=(1-d)/4): b and c have no
    # in-edges → base; hub = base(1+3d)/(1-d²); a = base + d·hub.
    # Power iteration converges at rate d^k → 0.85³⁰ ≈ 0.008 is the
    # honest tolerance band for 30 iterations.
    d, base = 0.85, 0.15 / 4
    hub = base * (1 + 3 * d) / (1 - d * d)
    a = base + d * hub
    pairs = [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a")]
    r = _ranks(spark, pairs, iterations=30)
    assert r["hub"] == pytest.approx(hub, abs=0.01)
    assert r["a"] == pytest.approx(a, abs=0.01)
    assert r["b"] == pytest.approx(base, abs=1e-12)  # exact: no inflow
    assert r["b"] == pytest.approx(r["c"], abs=1e-12)
    assert r["hub"] > r["a"] > r["b"]
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-9)


def test_dangling_mass_conserved(spark):
    # 'sink' has no out-edges: without redistribution the vector
    # leaks mass every iteration
    r = _ranks(spark, [("a", "sink"), ("b", "sink"), ("a", "b")])
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-9)
    assert r["sink"] > r["b"] > r["a"]


def test_self_loops_and_duplicates_collapse(spark):
    base = _ranks(spark, [("a", "b"), ("b", "a")])
    noisy = _ranks(
        spark,
        [("a", "b"), ("a", "b"), ("a", "a"), ("b", "a")],
    )
    for k in base:
        assert noisy[k] == pytest.approx(base[k], abs=1e-12)


def test_extract_outlinks(spark):
    from claude_readability_hook_spark.operators.linkgraph import (
        extract_outlinks,
    )

    docs = spark.createDataFrame(
        [
            (
                "a.com",
                '<a href="https://b.com/x">b</a> '
                "<a href='https://b.com/y'>b again</a> "  # same domain → 1 edge
                '<a href="https://a.com/self">self</a> '  # self → dropped
                '<a href="/relative">rel</a> '  # relative → skipped
                '<a href="https://c.com?q=1">c</a>',
            ),
            ("d.com", "no links at all"),
        ],
        "host string, text string",
    )
    edges = {(r["src"], r["dst"]) for r in extract_outlinks(docs).collect()}
    assert edges == {("a.com", "b.com"), ("a.com", "c.com")}


def test_outlinks_domain_normalization(spark):
    from claude_readability_hook_spark.operators.linkgraph import (
        extract_outlinks,
    )

    docs = spark.createDataFrame(
        [
            (
                "A.com",  # src lowercased too
                '<a href="https://Example.COM/x">1</a> '
                '<a href="https://example.com/y">2</a> '  # same node
                '<a href="HTTPS://EXAMPLE.com/z">3</a> '  # scheme case
                '<a href="https://user:pw@example.com/u">4</a> '  # userinfo
                '<a href="https://example.com:8080/p">5</a> '  # port
                '<a href="https://A.COM/self">self, case-differing</a>',
            ),
        ],
        "host string, text string",
    )
    edges = {(r["src"], r["dst"]) for r in extract_outlinks(docs).collect()}
    # one node per domain, case-differing self-link dropped
    assert edges == {("a.com", "example.com")}


def test_pagerank_micro_matches_float_loop(spark):
    """The int64 twin tracks the float loop within 1e-6 of total mass
    at the same iteration count — the bound the 10^12 scale buys."""
    from claude_readability_hook_spark.operators.linkgraph import (
        PAGERANK_MICRO_SCALE,
        domain_pagerank,
        domain_pagerank_micro,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("c", "d")],
        "src string, dst string",
    )
    fl = {r["domain"]: r["rank"] for r in domain_pagerank(edges, iterations=5).collect()}
    mi = {
        r["domain"]: r["rank_micro"] / PAGERANK_MICRO_SCALE
        for r in domain_pagerank_micro(edges, iterations=5).collect()
    }
    assert set(fl) == set(mi)
    for d in fl:
        assert abs(fl[d] - mi[d]) < 1e-6, (d, fl[d], mi[d])
    # integer mass is conserved up to the documented truncation loss
    total = sum(
        r["rank_micro"]
        for r in domain_pagerank_micro(edges, iterations=5).collect()
    )
    assert 0 <= PAGERANK_MICRO_SCALE - total < 100 * len(fl)


def test_pagerank_micro_dangling_mass(spark):
    """A dangling node's mass is redistributed — without the scalar
    correction the sink would keep everything it receives."""
    from claude_readability_hook_spark.operators.linkgraph import (
        domain_pagerank_micro,
    )

    edges = spark.createDataFrame(
        [("a", "sink"), ("b", "a"), ("a", "b")], "src string, dst string"
    )
    out = {
        r["domain"]: r["rank_micro"]
        for r in domain_pagerank_micro(edges, iterations=8).collect()
    }
    # a feeds both b and the sink; the loop stays live (no mass drain)
    assert out["a"] > out["sink"] > 0


def test_compose_frontier_priority(spark):
    from claude_readability_hook_spark.operators.frontier import (
        compose_frontier_priority,
    )

    urls = spark.createDataFrame(
        [
            ("https://www.known.com/a/1",),
            ("https://www.unknown.org/a/1",),
            ("https://1234567890.example.com/x",),  # fails the URL gate
        ],
        "url string",
    )
    authority = spark.createDataFrame(
        [("known.com", 1_000_000_000_000)], "domain string, rank_micro long"
    )
    quality = spark.createDataFrame(
        [("known.com", 900_000)], "domain string, quality_micro long"
    )
    out = {
        r["url"]: r
        for r in compose_frontier_priority(
            urls, authority=authority, domain_quality=quality
        ).collect()
    }
    known = out["https://www.known.com/a/1"]
    assert known["auth_micro"] == 1_000_000  # corpus max → full score
    assert known["qual_micro"] == 900_000
    assert known["url_micro"] == 1_000_000 - 5_000 * 2  # two path levels
    assert known["priority_micro"] == (1_000_000 + 900_000 + 990_000) // 3
    unk = out["https://www.unknown.org/a/1"]
    assert unk["auth_micro"] == 0 and unk["qual_micro"] == 500_000
    spam = out["https://1234567890.example.com/x"]
    assert spam["url_micro"] == 0
    assert known["priority_micro"] > unk["priority_micro"] > spam["priority_micro"]


def test_outlinks_feed_pagerank(spark):
    from claude_readability_hook_spark.operators.linkgraph import (
        domain_pagerank,
        extract_outlinks,
    )

    docs = spark.createDataFrame(
        [
            ("a.com", '<a href="https://hub.com/p">x</a>'),
            ("b.com", '<a href="https://hub.com/q">y</a>'),
            ("hub.com", '<a href="https://a.com/z">z</a>'),
        ],
        "host string, text string",
    )
    r = {
        row["domain"]: row["rank"]
        for row in domain_pagerank(extract_outlinks(docs), iterations=30).collect()
    }
    assert r["hub.com"] > r["b.com"]
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-9)
