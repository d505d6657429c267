"""Corpus drift + tokenizer fertility: hand-computed micro-rates,
TV-distance properties, and the fertility ratio on known byte costs."""

from __future__ import annotations

from claude_readability_hook_spark.operators.drift import corpus_drift


def test_drift_hand_computed(spark):
    a = spark.createDataFrame(
        [(1, "x x x y"), (2, "y z")], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(1, "x y y y"), (2, "y w")], "doc_id long, text string"
    )
    # A: x=3 y=2 z=1 (N=6); B: x=1 y=4 w=1 (N=6)
    rows = {r["token"]: r for r in corpus_drift(a, b, top_k=10).collect()}
    assert rows["x"]["pa_micro"] == 500_000 and rows["x"]["pb_micro"] == 166_667
    assert rows["x"]["drift_micro"] == 333_333
    assert rows["y"]["drift_micro"] == abs(333_333 - 666_667)
    assert rows["z"]["n_b"] == 0 and rows["w"]["n_a"] == 0
    assert rows["z"]["drift_micro"] == 166_667
    tv = {r["tv_micro"] for r in rows.values()}
    assert tv == {
        (333_333 + 333_334 + 166_667 + 166_667) // 2
    }  # same value rides every row


def test_drift_identical_snapshots_zero(spark):
    a = spark.createDataFrame(
        [(1, "alpha beta beta"), (2, "gamma")], "doc_id long, text string"
    )
    out = corpus_drift(a, a, top_k=5).collect()
    assert out and all(
        r["drift_micro"] == 0 and r["tv_micro"] == 0 for r in out
    )


def test_drift_topk_boundary_deterministic(spark):
    """Ranking is (drift desc, token asc): with k below the tied-token
    count the kept set is the lexicographically smallest."""
    a = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    b = spark.createDataFrame([(1, "e f g h")], "doc_id long, text string")
    kept = {r["token"] for r in corpus_drift(a, b, top_k=4).collect()}
    assert kept == {"a", "b", "c", "d"}


def test_tokenizer_fertility_byte_costs(spark):
    """CJK text costs ~3 bytes per base symbol with no applicable
    merges, ASCII-trained merges compress the ASCII group — the
    fertility gap the operator exists to expose."""
    from claude_readability_hook_spark.operators.bpetrain import (
        learn_byte_bpe_merges,
        tokenizer_fertility,
    )

    rows = [
        (1, "en", "the cat the cat the cat"),
        (2, "en", "the cat sat"),
        (3, "ja", "こんにちは 世界"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    merges = learn_byte_bpe_merges(df, k=6)
    out = {
        r["lang"]: r
        for r in tokenizer_fertility(df, merges, group_col="lang").collect()
    }
    en, ja = out["en"], out["ja"]
    assert en["n_docs"] == 2 and ja["n_docs"] == 1
    assert ja["total_bytes"] == len("こんにちは 世界".encode())
    # merges trained on the repeated ASCII give en > 1 byte/token;
    # ja pretokens have no learned merges → ~1 byte per token → the
    # en fertility strictly exceeds ja's only if merges applied
    assert en["bytes_per_token_micro"] > 1_000_000
    assert en["bytes_per_token_micro"] > ja["bytes_per_token_micro"] or (
        ja["bytes_per_token_micro"] >= 1_000_000
    )
    # exact ratio replay for ja: bytes/tokens in half-up micro
    nb, nt = ja["total_bytes"], ja["total_tokens"]
    assert ja["bytes_per_token_micro"] == (2 * nb * 1_000_000 + nt) // (2 * nt)
