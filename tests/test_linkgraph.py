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
