"""Unigram-LM tokenizer (operators/unigram.py): seed counts, the
canonical (cost, n_pieces, mask) Viterbi objective, EM training, and
the encode surfaces."""

from __future__ import annotations

from claude_readability_hook_spark.operators.unigram import (
    piece_cost_micro,
    seed_piece_counts,
    train_unigram,
    unigram_encode_counts,
    unigram_token_counts,
    viterbi_segment,
)


def test_viterbi_prefers_cheap_long_piece():
    costs = {"a": 100, "b": 100, "ab": 50, "abc": 500, "c": 100}
    # ab+c = 150 beats a+b+c = 300 and abc = 500
    assert viterbi_segment("abc", costs) == ["ab", "c"]


def test_viterbi_tiebreak_is_mask_ascending():
    # "abab": ab+ab vs a+bab … craft an exact cost tie between
    # ab|ab (mask 0b10) and aba|b (mask 0b100): both 2 pieces, cost 200
    costs = {"ab": 100, "aba": 100, "b": 100, "a": 999, "abab": 999}
    assert viterbi_segment("abab", costs) == ["ab", "ab"]  # smaller mask


def test_viterbi_unknown_char_fallback():
    costs = {"ab": 10}
    # 'x' is not in the vocab: single-char unk fallback keeps it total
    assert viterbi_segment("abx", costs) == ["ab", "x"]


def test_viterbi_long_pretoken_char_split():
    costs = {"a": 1}
    out = viterbi_segment("a" * 70, costs)
    assert out == ["a"] * 70


def test_seed_counts_overlap(spark):
    df = spark.createDataFrame([("aaa", 2)], "pretoken string, n long")
    got = {r["piece"]: r["count"] for r in seed_piece_counts(df).collect()}
    assert got == {"a": 6, "aa": 4, "aaa": 2}


def test_train_and_encode_roundtrip(spark):
    docs = spark.createDataFrame(
        [(i, "spark spark stream sparkstream") for i in range(4)],
        "doc_id long, text string",
    )
    vocab = train_unigram(docs, iterations=2)
    rows = {r["piece"]: r for r in vocab.collect()}
    assert rows  # non-empty, every count positive, costs consistent
    total = sum(r["count"] for r in rows.values())
    for r in rows.values():
        assert r["count"] > 0
        assert r["cost_micro"] == piece_cost_micro(r["count"], total)
    enc = unigram_encode_counts(docs, vocab).collect()
    assert len(enc) == 4
    # identical docs → identical streams and counts
    assert len({(r["n_tokens"], r["pieces_md5"]) for r in enc}) == 1
    cnt = unigram_token_counts(docs, vocab).collect()
    assert {r["n_tokens"] for r in cnt} == {enc[0]["n_tokens"]}


def test_top_k_keeps_single_chars(spark):
    docs = spark.createDataFrame(
        [(0, "ab ab cd x")], "doc_id long, text string"
    )
    vocab = train_unigram(docs, iterations=1, top_k=1)
    pieces = {r["piece"] for r in vocab.collect()}
    # top-1 by count is 'ab'; the used single char 'x' survives the
    # prune (coverage guarantee), 'cd' is cut
    assert "ab" in pieces and "x" in pieces and "cd" not in pieces
    # encode still totals: the pruned word falls back to unk chars
    enc = unigram_encode_counts(docs, vocab).collect()
    assert enc[0]["n_tokens"] == 1 + 1 + 2 + 1


def test_pack_assignments_unigram(spark):
    from claude_readability_hook_spark.operators.packing import (
        pack_assignments,
        pack_assignments_unigram,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, "s0", "alpha beta gamma alphabeta") for i in range(20)],
        "doc_id long, source string, text string",
    )
    vocab = train_unigram(docs, iterations=2)
    got = pack_assignments_unigram(docs, vocab, seq_len=16).collect()
    assert len(got) == 20
    # differential: identical to the generic path fed the same counts
    counts = {
        r["doc_id"]: r["n_tokens"]
        for r in unigram_token_counts(docs, vocab).collect()
    }
    assert len(set(counts.values())) == 1  # identical docs
    n = next(iter(counts.values()))
    ref = pack_assignments(docs, seq_len=16, count_expr=F.lit(n)).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, ref))
    # two-level prefix sum is bit-identical
    two = pack_assignments_unigram(docs, vocab, seq_len=16, bucket_span=4)
    assert sorted(map(tuple, got)) == sorted(map(tuple, two.collect()))


def test_unigram_fertility_vs_byte_bpe(spark):
    """The two tokenizer families report fertility on the SAME corpus
    with the SAME schema — the merge-budget comparison the fertility
    docstring promises."""
    from claude_readability_hook_spark.operators.bpetrain import (
        learn_byte_bpe_merges,
        tokenizer_fertility,
    )
    from claude_readability_hook_spark.operators.unigram import (
        unigram_fertility,
    )

    docs = spark.createDataFrame(
        [
            (0, "en", "the table the table scan"),
            (1, "en", "the scan table"),
            (2, "de", "der tisch der tisch"),
        ],
        "doc_id long, lang string, text string",
    )
    merges = learn_byte_bpe_merges(docs, k=4)
    bpe = {r["lang"]: r for r in tokenizer_fertility(docs, merges).collect()}
    vocab = train_unigram(docs, iterations=2)
    uni = {r["lang"]: r for r in unigram_fertility(docs, vocab).collect()}
    assert set(bpe) == set(uni) == {"en", "de"}
    for lang in ("en", "de"):
        assert bpe[lang]["total_bytes"] == uni[lang]["total_bytes"]
        assert uni[lang]["bytes_per_token_micro"] > 0
        assert bpe[lang]["bytes_per_token_micro"] > 0
        # a 2-round unigram vocab keeps whole words → fewer tokens
        # than a 4-merge byte BPE on this corpus
        assert uni[lang]["total_tokens"] <= bpe[lang]["total_tokens"]


def test_unigram_artifact_roundtrip(spark, tmp_path):
    import pytest

    from claude_readability_hook_spark.operators.unigram import (
        load_unigram_artifact,
        save_unigram_artifact,
    )

    docs = spark.createDataFrame(
        [(0, "alpha beta alpha")], "doc_id long, text string"
    )
    vocab = train_unigram(docs, iterations=1)
    root = str(tmp_path / "tok")
    v1 = save_unigram_artifact(vocab, root)
    loaded = load_unigram_artifact(spark, root)
    assert sorted(map(tuple, loaded.collect())) == sorted(
        map(tuple, vocab.collect())
    )
    # retrain publishes the next version; old version stays readable
    v2 = save_unigram_artifact(vocab, root, retain_snapshots=2)
    assert v2 == v1 + 1
    assert load_unigram_artifact(spark, root, version=v1).count() == vocab.count()
    # family mismatch is an explicit error, not a silent mis-decode
    from claude_readability_hook_spark.operators.bpetrain import (
        save_bpe_artifact,
    )

    broot = str(tmp_path / "bpe")
    save_bpe_artifact(vocab, broot)
    with pytest.raises(ValueError):
        load_unigram_artifact(spark, broot)


def test_pack_unigram_records_stream(spark):
    from claude_readability_hook_spark.operators.packing import (
        pack_unigram_records,
    )

    docs = spark.createDataFrame(
        [(i, "s0", "alpha beta gamma") for i in range(6)],
        "doc_id long, source string, text string",
    )
    vocab = train_unigram(docs, iterations=2)
    per_doc = unigram_token_counts(docs, vocab).collect()[0]["n_tokens"]
    recs = pack_unigram_records(docs, vocab, seq_len=7).collect()
    total = 6 * per_doc
    assert sum(r["n"] for r in recs) == total
    # every pack but the shard's last is exactly full and gap-free
    full = [r for r in recs if r["pack_id"] < (total - 1) // 7]
    assert all(r["n"] == 7 and len(r["tokens"]) == 7 for r in full)
    # boundaries metadata rides every record
    assert all(r["docs"] is not None for r in recs)
    # the stream replays the per-doc segmentation end to end
    stream = []
    for r in sorted(recs, key=lambda r: r["pack_id"]):
        stream.extend(r["tokens"])
    enc = unigram_encode_counts(docs, vocab).collect()[0]
    import hashlib

    one_doc = stream[:per_doc]
    assert (
        hashlib.md5(" ".join(one_doc).encode()).hexdigest()
        == enc["pieces_md5"]
    )


def test_seed_counts_skip_absurd_pretokens(spark):
    df = spark.createDataFrame(
        [("ab", 1), ("x" * 200, 5)], "pretoken string, n long"
    )
    got = {r["piece"] for r in seed_piece_counts(df).collect()}
    # the 200-char monster contributes nothing to seeding
    assert got == {"a", "b", "ab"}
