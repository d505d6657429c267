"""Bigram-LM quality filter: hand-computed add-one semantics, the
broadcast regime knob, the curation gate, and the no-text-shuffle
plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from claude_readability_hook_spark.operators.lmfilter import (
    lm_quality_filter,
    lm_surprise_scores,
    train_bigram_lm,
)

SF_DIR = "/root/testdata/sf0.001"


def _tiny(spark):
    return spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "zzz"), (4, "q r")],
        "doc_id long, text string",
    )


def test_hand_computed_add_one_scores(spark):
    """LM trained on ALL four docs (sample_mod=None):
    c12 = {(a,b):3, (b,a):1, (b,c):1, (q,r):1}; c1 = {a:3, b:2, q:1};
    V = |{a,b,c,zzz,q,r}| = 6. Surprise s = (c1+V)/(c12+1):
      doc 1: (a,b)=9/4=2.25, (b,a)=8/2=4.0, (a,b)=2.25 → mean 2.833333
      doc 2: 2.25, (b,c)=8/2=4.0 → mean 3.125
      doc 3: no bigrams → 0.0
      doc 4: (q,r)=7/2=3.5 → 3.5"""
    df = _tiny(spark)
    lm = train_bigram_lm(df, sample_mod=None)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["lm_score"])
        for r in lm_surprise_scores(df, lm=lm).collect()
    }
    assert got == {
        1: (3, 2.833333),
        2: (2, 3.125),
        3: (0, 0.0),
        4: (1, 3.5),
    }


def test_unseen_context_scores_v_over_one(spark):
    """A doc whose contexts the sample never saw: c1=0, c12=0 → every
    term is (0+V)/(0+1) = V — the maximal surprise, exactly the docs
    the filter exists to drop."""
    df = _tiny(spark)
    lm = train_bigram_lm(df, sample_mod=None)
    unseen = spark.createDataFrame(
        [(9, "xx yy xx")], "doc_id long, text string"
    )
    [r] = lm_surprise_scores(unseen, lm=lm).collect()
    assert (r["n_bigrams"], r["lm_score"]) == (2, 6.0)  # V = 6


def test_broadcast_regime_knob_equal_results(spark):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )
    a = sorted(map(tuple, lm_surprise_scores(docs, broadcast_lm=True).collect()))
    b = sorted(map(tuple, lm_surprise_scores(docs, broadcast_lm=False).collect()))
    assert a == b and len(a) == 200


def test_quality_filter_gate(spark):
    df = _tiny(spark)
    lm = train_bigram_lm(df, sample_mod=None)
    kept = lm_quality_filter(df, max_score=3.2, lm=lm)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 2, 3]
    assert "lm_score" in kept.columns and "text" in kept.columns


def test_score_plan_broadcasts_lm_and_never_shuffles_text(spark):
    """With broadcast_lm=True the count tables arrive by
    BroadcastExchange and the doc side reaches its per-doc agg without
    an exchange below the partial aggregate — the only shuffle carries
    (doc_id, partials), never tokens."""
    import contextlib
    import io

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    plan_df = lm_surprise_scores(docs)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("BroadcastExchange") >= 2  # bg + ctx (+ vocab)
    # every (non-broadcast) Exchange is hash-partitioned on doc_id or a
    # single partition (the 1-row vocab agg) — no token/bigram shuffle
    import re

    for m in re.finditer(r"Exchange (\w+)\(?([^\n]*)", plan):
        kind, detail = m.group(1), m.group(2)
        if kind == "SinglePartition" or "broadcast" in detail.lower():
            continue
        assert "doc_id" in detail, f"unexpected shuffle: {m.group(0)}"


def test_trigram_hand_computed_scores(spark):
    """Order-3 semantics on the tiny corpus (trained on all docs):
    doc1 'a b a b' yields (a b, a b a), (b a, b a b); doc2 'a b c'
    yields (a b, a b c). c3: each 1. c2: {a b: 2, b a: 1}.
    V = |{a,b,c,zzz,q,r}| = 6.
      doc1: t1 num=c2(a b)+6=8, den=c3(a b a)+1=2 → 4.0;
            t2 num=c2(b a)+6=7, den=2 → 3.5 → mean 3.75
      doc2: (a b, a b c): num=8, den=2 → 4.0
      doc3 'zzz', doc4 'q r': <3 tokens → 0.0"""
    from claude_readability_hook_spark.operators.lmfilter import (
        lm_trigram_surprise_scores,
        train_trigram_lm,
    )

    df = _tiny(spark)
    lm = train_trigram_lm(df, sample_mod=None)
    got = {
        r["doc_id"]: (r["n_trigrams"], r["lm3_score"])
        for r in lm_trigram_surprise_scores(df, lm=lm).collect()
    }
    assert got == {
        1: (2, 3.75),
        2: (1, 4.0),
        3: (0, 0.0),
        4: (0, 0.0),
    }


def test_trigram_broadcast_knob_equal(spark):
    from claude_readability_hook_spark.operators.lmfilter import (
        lm_trigram_surprise_scores,
    )

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .limit(150)
    )
    a = sorted(map(tuple, lm_trigram_surprise_scores(docs, broadcast_lm=True).collect()))
    b = sorted(map(tuple, lm_trigram_surprise_scores(docs, broadcast_lm=False).collect()))
    assert a == b and len(a) == 150
