"""Domain-level curation signals: eTLD+1 extraction cases,
hand-computed per-domain aggregates, gate reason precedence, and the
auto-broadcast regime on the signals join."""

from __future__ import annotations

from pyspark.sql import functions as F

from claude_readability_hook_spark.operators.domains import (
    GATE_BLOCKLISTED,
    GATE_DUP_HEAVY,
    GATE_LOW_QUALITY,
    GATE_OK,
    GATE_PII_DENSE,
    GATE_TOO_FEW_DOCS,
    domain_gate,
    domain_signals,
    registrable_domain_expr,
)

GOOD = (
    "the quick brown fox jumps over the lazy dog while many other "
    "animals watch from the forest edge and wait for their turn"
)


def test_registrable_domain_cases(spark):
    cases = {
        "www.Example.CO.UK": "example.co.uk",
        "a.b.news.example.co.uk": "example.co.uk",
        "mirror.example.com": "example.com",
        "example.com": "example.com",
        "localhost": "localhost",
        "203.0.113.7": "203.0.113.7",
        "foo.github.io": "foo.github.io",
        "deep.sub.foo.github.io": "foo.github.io",
        "docs.python.org": "python.org",
        "shop.example.com.au": "example.com.au",
    }
    rows = (
        spark.createDataFrame([(h,) for h in cases], "host string")
        .select("host", registrable_domain_expr(F.col("host")).alias("d"))
        .collect()
    )
    for r in rows:
        assert r["d"] == cases[r["host"]], r["host"]


def _toy_docs(spark):
    # a.example.com: 3 docs, one exact-dup pair, all good quality
    # b.example.com: 1 doc (same registrable domain as a.*)
    # spam.net: 2 identical low-quality docs stuffed with emails
    # lone.org: 1 doc below min_docs thresholds
    rows = [
        (1, "a.example.com", GOOD),
        (2, "a.example.com", GOOD),
        (3, "a.example.com", GOOD + " extra tail words here"),
        (4, "b.example.com", GOOD + " another distinct body"),
        (5, "spam.net", "x@y.com z@w.com q@r.com !!!! ???? ....)"),
        (6, "spam.net", "x@y.com z@w.com q@r.com !!!! ???? ....)"),
        (7, "lone.org", GOOD + " solitary page"),
    ]
    return spark.createDataFrame(rows, "doc_id long, host string, text string")


def test_domain_signals_hand_computed(spark):
    sig = {
        r["domain"]: r
        for r in domain_signals(_toy_docs(spark), sample_mod=None).collect()
    }
    assert set(sig) == {"example.com", "spam.net", "lone.org"}
    ex = sig["example.com"]
    assert (ex["n_docs"], ex["n_hosts"]) == (4, 2)
    assert ex["n_exact_dup"] == 1  # docs 1/2 share a text
    assert ex["dup_micro"] == 250_000
    assert ex["n_quality_keep"] == 4 and ex["quality_micro"] == 1_000_000
    assert ex["pii_hits"] == 0 and ex["pii_per_mchar"] == 0
    assert ex["n_bigrams"] > 0 and ex["lm_micro"] > 0
    sp = sig["spam.net"]
    assert sp["n_exact_dup"] == 1 and sp["dup_micro"] == 500_000
    assert sp["n_quality_keep"] == 0  # alpha ratio below the gate
    assert sp["pii_hits"] == 6  # three emails per doc
    assert sp["pii_per_mchar"] > 50_000
    assert sig["lone.org"]["n_docs"] == 1


def test_domain_gate_reasons_and_precedence(spark):
    docs = _toy_docs(spark)
    out = domain_gate(
        docs,
        min_docs=2,
        max_dup_micro=300_000,
        min_quality_micro=500_000,
        max_pii_per_mchar=10_000,
        blocklist=(),
    )
    by_domain = {
        r["domain"]: (r["domain_keep"], r["gate_reason"])
        for r in out.select("domain", "domain_keep", "gate_reason")
        .distinct()
        .collect()
    }
    assert by_domain["example.com"] == (True, GATE_OK)
    # spam.net fails dup AND quality AND pii — dup wins by precedence
    assert by_domain["spam.net"] == (False, GATE_DUP_HEAVY)
    assert by_domain["lone.org"] == (False, GATE_TOO_FEW_DOCS)

    # blocklist outranks everything; quality and pii branches reachable
    out2 = domain_gate(
        docs,
        min_docs=1,
        max_dup_micro=600_000,
        min_quality_micro=500_000,
        max_pii_per_mchar=10_000,
        blocklist=("spam.net",),
    )
    reasons = {
        r["domain"]: r["gate_reason"]
        for r in out2.select("domain", "gate_reason").distinct().collect()
    }
    assert reasons["spam.net"] == GATE_BLOCKLISTED
    out3 = domain_gate(
        docs,
        min_docs=1,
        max_dup_micro=600_000,
        min_quality_micro=500_000,
        max_pii_per_mchar=1,
    )
    reasons3 = {
        r["domain"]: r["gate_reason"]
        for r in out3.select("domain", "gate_reason").distinct().collect()
    }
    assert reasons3["spam.net"] in (GATE_LOW_QUALITY, GATE_PII_DENSE)
    # every input row survives with its columns intact
    assert out.count() == docs.count()
    assert set(docs.columns) < set(out.columns)


def test_domain_gate_auto_broadcast_regime(spark):
    """Signals join broadcasts under the counted threshold and flips
    to a shuffle join above it — identical verdicts either way."""

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    docs = _toy_docs(spark)
    small = domain_gate(docs, min_docs=2)
    assert "BroadcastHashJoin" in plan(small)
    big = domain_gate(docs, min_docs=2, broadcast_signals_max=1)
    assert "BroadcastHashJoin" not in plan(big)

    def norm(df):
        return sorted(
            (r["doc_id"], r["domain"], r["domain_keep"], r["gate_reason"])
            for r in df.select(
                "doc_id", "domain", "domain_keep", "gate_reason"
            ).collect()
        )

    assert norm(small) == norm(big)
