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


def test_dsir_weights_ratio_matches_two_separate_scorers(spark):
    """dsir_weight is exactly mean_corpus_micro / mean_target_micro:
    the combined one-scan implementation must agree with two separate
    lm_surprise_scores passes over the same pre-trained LMs."""
    from claude_readability_hook_spark.operators.lmfilter import (
        dsir_importance_weights,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat", "en"),
            (2, "the dog sat on the rug", "en"),
            (3, "der hund sitzt auf dem teppich", "de"),
            (4, "le chat est sur le tapis", "fr"),
            (5, "the cat sat", "en"),
            (6, "x", "en"),  # <2 tokens → neutral weight
        ],
        "doc_id long, text string, lang string",
    )
    target = docs.filter(F.col("lang") == "en")
    lm_t = train_bigram_lm(target, sample_mod=None)
    lm_r = train_bigram_lm(docs, sample_mod=None)
    out = {
        r["doc_id"]: r
        for r in dsir_importance_weights(
            docs, target, lm_target=lm_t, lm_corpus=lm_r
        ).collect()
    }
    st = {
        r["doc_id"]: r["lm_score"]
        for r in lm_surprise_scores(docs, lm=lm_t).collect()
    }
    sr = {
        r["doc_id"]: r["lm_score"]
        for r in lm_surprise_scores(docs, lm=lm_r).collect()
    }
    for d in (1, 2, 3, 4, 5):
        assert abs(out[d]["lm_target"] - st[d]) < 1e-9
        assert abs(out[d]["lm_corpus"] - sr[d]) < 1e-9
        assert abs(out[d]["dsir_weight"] - round(sr[d] / st[d], 6)) < 1e-9
    # in-domain docs read easier under the target LM than out-of-domain
    assert out[1]["dsir_weight"] > out[3]["dsir_weight"]
    assert out[2]["dsir_weight"] > out[4]["dsir_weight"]
    # neutral for the token-starved doc
    assert out[6]["n_bigrams"] == 0 and out[6]["dsir_weight"] == 1.0


def test_dsir_broadcast_knob_equal(spark):
    from claude_readability_hook_spark.operators.lmfilter import (
        dsir_importance_weights,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b", "en"), (2, "c d c", "de"), (3, "a b c", "en")],
        "doc_id long, text string, lang string",
    )
    target = docs.filter(F.col("lang") == "en")
    a = sorted(
        map(tuple, dsir_importance_weights(docs, target, sample_mod=None,
                                           broadcast_lm=True).collect())
    )
    b = sorted(
        map(tuple, dsir_importance_weights(docs, target, sample_mod=None,
                                           broadcast_lm=False).collect())
    )
    assert a == b


def test_dsir_resample_deterministic_and_capped(spark):
    """The RNG-free acceptance draw: identical runs keep the identical
    set; weights >= scale are always kept (acceptance capped at 1)."""
    from claude_readability_hook_spark.operators.lmfilter import (
        dsir_resample_expr,
    )

    rows = [(i, float(w)) for i, w in enumerate([0.1, 0.5, 1.0, 2.0, 5.0] * 20)]
    df = spark.createDataFrame(rows, "doc_id long, dsir_weight double")
    kept1 = {r["doc_id"] for r in df.filter(dsir_resample_expr(scale=2)).collect()}
    kept2 = {r["doc_id"] for r in df.filter(dsir_resample_expr(scale=2)).collect()}
    assert kept1 == kept2
    # weight >= scale → acceptance 1.0 → always kept
    heavy = {r["doc_id"] for r in df.filter(F.col("dsir_weight") >= 2.0).collect()}
    assert heavy <= kept1
    # light docs are thinned, not eliminated wholesale
    light = {r["doc_id"] for r in df.filter(F.col("dsir_weight") <= 0.5).collect()}
    assert 0 < len(kept1 & light) < len(light)


def test_dsir_domain_mixture_shares(spark):
    """Shares sum to 1 and favor the in-domain source; uniform weights
    reduce to doc-count shares."""
    from claude_readability_hook_spark.operators.lmfilter import (
        dsir_domain_mixture,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat", "en", "web"),
            (2, "the dog sat on the rug", "en", "web"),
            (3, "the cat and the dog sat", "en", "web"),
            (4, "der hund sitzt auf dem teppich", "de", "forum"),
            (5, "der hund und der teppich", "de", "forum"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = {
        r["domain"]: r
        for r in dsir_domain_mixture(
            docs, docs.filter(F.col("lang") == "en"), sample_mod=None
        ).collect()
    }
    assert set(out) == {"web", "forum"}
    assert abs(out["web"]["mixture_share"] + out["forum"]["mixture_share"] - 1.0) < 1e-6
    # the English source out-masses its doc-count share
    assert out["web"]["mixture_share"] > 3 / 5
    assert out["web"]["mean_weight"] > out["forum"]["mean_weight"]
    assert out["web"]["n_docs"] == 3 and out["forum"]["n_docs"] == 2


def test_release_lm_unpersists_both_orders(spark):
    """The ownership contract: release_lm drops every cached partition
    behind the trainer tuple — including the trigram table, whose
    returned frame is a PROJECTION of the persisted parent."""
    from pyspark import StorageLevel
    from claude_readability_hook_spark.operators.lmfilter import (
        release_lm,
        train_trigram_lm,
    )

    df = _tiny(spark)
    lm2 = train_bigram_lm(df, sample_mod=None)
    lm3 = train_trigram_lm(df, sample_mod=None)
    lm_surprise_scores(df, lm=lm2).collect()  # materializes the caches
    assert lm2[0].storageLevel != StorageLevel.NONE
    assert lm3[0]._crh_persisted[0].storageLevel != StorageLevel.NONE
    release_lm(lm2)
    release_lm(lm3)
    assert lm2[0].storageLevel == StorageLevel.NONE
    assert lm2[2].storageLevel == StorageLevel.NONE
    assert lm3[0]._crh_persisted[0].storageLevel == StorageLevel.NONE
    assert lm3[2].storageLevel == StorageLevel.NONE
    # never-persisted tuples release as a no-op
    release_lm(train_bigram_lm(df, sample_mod=None, persist=False))


def test_broadcast_lm_auto_regime(spark, monkeypatch):
    """broadcast_lm=None counts the bigram table: broadcast under the
    bound, shuffle join above it (bound forced to 0) — identical
    scores either way."""
    from claude_readability_hook_spark.operators import lmfilter

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta alpha beta") for i in range(12)],
        "doc_id long, text string",
    )

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    auto = lmfilter.lm_surprise_scores(docs, sample_mod=None)
    assert "BroadcastHashJoin" in plan(auto)
    # disable the auto-broadcast threshold so only the HINT decides —
    # with the bound forced to 0 the hint must be absent
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        monkeypatch.setattr(lmfilter, "LM_BROADCAST_MAX_ROWS", 0)
        shuffled = lmfilter.lm_surprise_scores(docs, sample_mod=None)
        assert "BroadcastHashJoin" not in plan(shuffled)
        assert sorted(map(tuple, auto.collect())) == sorted(
            map(tuple, shuffled.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_kn_hand_computed_scores(spark):
    """KN over the _tiny corpus (trained on all docs): bg types
    {(a,b):3,(b,a):1,(b,c):1,(q,r):1} → T=4, V=6, T+V=10;
    ctx a:(c1=3,n1=1) b:(2,2) q:(1,1); cont b/a/c/r all ncont=1.
      p(b|a) = [max(12−3,0)·10 + 3·1·2]/[4·3·10] = 96/120 → 1/p=1.25
      p(a|b) = [10 + 3·2·2]/80 = 22/80        → 80/22 = 3.636364
      p(c|b) = same 22/80                      → 3.636364
      p(r|q) = [10 + 3·1·2]/40 = 16/40         → 40/16 = 2.5
    doc 1 mean (1250000+3636364+1250000)/3 → 2.045455
    doc 2 mean (1250000+3636364)/2 = 2443182 exactly → 2.443182
    doc 3: no bigrams → 0.0; doc 4 → 2.5"""
    from claude_readability_hook_spark.operators.lmfilter import (
        lm_kn_surprise_scores,
        train_kn_bigram_lm,
    )

    df = _tiny(spark)
    lm = train_kn_bigram_lm(df, sample_mod=None)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["kn_score"])
        for r in lm_kn_surprise_scores(df, lm=lm).collect()
    }
    assert got == {
        1: (3, 2.045455),
        2: (2, 2.443182),
        3: (0, 0.0),
        4: (1, 2.5),
    }


def test_kn_unseen_context_backs_off_to_continuation(spark):
    """Unseen context w1 → λ=1 full backoff: p = (ncont+1)/(T+V).
    'xx yy xx': both contexts unseen, both continuations unseen →
    p = 1/10 each → surprise 10.0. And a SEEN context with an unseen
    continuation ('a zzz') gets num=3·n1·1, den=4·c1·10 → 120/3 = 40
    — harsher than the promiscuous-context case but finite, unlike
    textbook KN's zero."""
    from claude_readability_hook_spark.operators.lmfilter import (
        lm_kn_surprise_scores,
        train_kn_bigram_lm,
    )

    df = _tiny(spark)
    lm = train_kn_bigram_lm(df, sample_mod=None)
    probes = spark.createDataFrame(
        [(9, "xx yy xx"), (10, "a zzz")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["kn_score"])
        for r in lm_kn_surprise_scores(probes, lm=lm).collect()
    }
    assert got == {9: (2, 10.0), 10: (1, 40.0)}


def test_kn_broadcast_knob_equal(spark):
    from claude_readability_hook_spark.operators.lmfilter import (
        lm_kn_surprise_scores,
    )

    df = _tiny(spark)
    a = sorted(
        map(tuple, lm_kn_surprise_scores(df, sample_mod=None, broadcast_lm=True).collect())
    )
    b = sorted(
        map(tuple, lm_kn_surprise_scores(df, sample_mod=None, broadcast_lm=False).collect())
    )
    assert a == b


def test_fertility_token_mixture(spark):
    from claude_readability_hook_spark.operators.lmfilter import (
        fertility_token_mixture,
    )

    mixture = spark.createDataFrame(
        [("en", 80, 1.0, 0.8), ("de", 20, 1.0, 0.2)],
        "domain string, n_docs long, mean_weight double, mixture_share double",
    )
    fert = spark.createDataFrame(
        # de charges 3x the pieces per doc
        [("en", 80, 8000, 800, 10_000_000), ("de", 20, 6000, 600, 10_000_000)],
        "lang string, n_docs long, total_bytes long, total_tokens long,"
        " bytes_per_token_micro long",
    )
    out = {r["domain"]: r for r in fertility_token_mixture(mixture, fert).collect()}
    # tokens_per_doc: en 10, de 30 → token mass 8 vs 6 → shares 4/7, 3/7
    assert out["en"]["tokens_per_doc"] == 10.0
    assert out["de"]["tokens_per_doc"] == 30.0
    assert abs(out["en"]["token_share"] - 8 / 14) < 1e-6
    assert abs(out["de"]["token_share"] - 6 / 14) < 1e-6


def test_fertility_token_mixture_missing_domain_default(spark):
    from claude_readability_hook_spark.operators.lmfilter import (
        fertility_token_mixture,
    )

    mixture = spark.createDataFrame(
        [("en", 10, 1.0, 0.5), ("xx", 10, 1.0, 0.5)],
        "domain string, n_docs long, mean_weight double, mixture_share double",
    )
    fert = spark.createDataFrame(
        [("en", 10, 1000, 100, 10_000_000)],
        "lang string, n_docs long, total_bytes long, total_tokens long,"
        " bytes_per_token_micro long",
    )
    out = {r["domain"]: r for r in fertility_token_mixture(mixture, fert).collect()}
    # xx has no fertility row → global tokens/doc (= en's 10) → equal shares
    assert out["xx"]["tokens_per_doc"] == 10.0
    assert abs(out["xx"]["token_share"] - 0.5) < 1e-6
