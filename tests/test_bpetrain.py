"""BPE merge training: hand-computed merges, exact leftmost
non-overlap run semantics, and a differential check against a pure
pure-Python Sennrich-style reference on real corpus words."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from claude_readability_hook_spark.operators.bpetrain import (
    apply_merges_expr,
    bpe_encode_counts,
    learn_bpe_merges,
)

SF_DIR = "/root/testdata/sf0.001"


def _ref_bpe(word_counts: dict[str, int], k: int):
    """Reference implementation: Sennrich get_stats/merge loop over
    (symbol tuple → count), leftmost non-overlapping merge, tie-break
    (count desc, 'lhs rhs' asc)."""
    vocab = {
        tuple(list(w) + ["</w>"]): n for w, n in word_counts.items()
    }
    merges = []
    for _ in range(k):
        stats = collections.Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += n
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        (a, b), cnt = best
        merges.append((a, b, a + b, cnt))
        new_vocab = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def test_hand_computed_merge_table(spark):
    df = spark.createDataFrame(
        [(1, "low low low lower lower lowest"), (2, "new newer newest low")],
        "doc_id long, text string",
    )
    rows = learn_bpe_merges(df, k=6).orderBy("merge_rank").collect()
    got = [(r["lhs"], r["rhs"], r["merged"], r["pair_count"]) for r in rows]
    assert got == [
        ("l", "o", "lo", 7),
        ("lo", "w", "low", 7),
        ("low", "</w>", "low</w>", 4),
        ("e", "r", "er", 3),
        ("e", "w", "ew", 3),
        ("er", "</w>", "er</w>", 3),
    ]


def test_run_merge_is_leftmost_nonoverlapping(spark):
    """'aaaaa' + merge (a,a) must give [aa, aa, a] — the Sennrich scan
    order (the shared-separator replace bug would give [aa, a, aa] and
    a different symbol count after further merges)."""
    df = spark.createDataFrame([(1, "aaaaa")], "doc_id long, text string")
    [r] = (
        df.select(
            apply_merges_expr(F.lit("aaaaa"), [("a", "a")]).alias("syms")
        ).collect()
    )
    assert r["syms"] == ["aa", "aa", "a", "</w>"]
    # and the follow-up merge sees (aa, aa), not (a, aa)
    [r2] = (
        df.select(
            apply_merges_expr(F.lit("aaaaa"), [("a", "a"), ("aa", "aa")]).alias(
                "syms"
            )
        ).collect()
    )
    assert r2["syms"] == ["aaaa", "a", "</w>"]


def test_matches_reference_bpe_on_real_corpus(spark):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .limit(120)
    )
    rows = learn_bpe_merges(docs, k=10).orderBy("merge_rank").collect()
    got = [(r["lhs"], r["rhs"], r["merged"], r["pair_count"]) for r in rows]

    counts = collections.Counter()
    for r in docs.collect():
        for w in r["text"].lower().split():
            counts[w] += 1
    want = _ref_bpe(dict(counts), k=10)
    assert got == want


def test_encode_preserves_word_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "low lower"), (2, "")], "doc_id long, text string"
    )
    merges = [
        (r["lhs"], r["rhs"])
        for r in learn_bpe_merges(df, k=4).orderBy("merge_rank").collect()
    ]
    # symbols re-concatenate to word + marker (no characters lost)
    [r] = df.filter("doc_id = 1").select(
        apply_merges_expr(F.lit("lower"), merges).alias("syms")
    ).collect()
    assert "".join(r["syms"]) == "lower</w>"
    enc = {
        r["doc_id"]: (r["n_words"], r["n_bpe_symbols"])
        for r in bpe_encode_counts(df, merges).collect()
    }
    assert enc[2] == (0, 0)
    assert enc[1][0] == 2 and enc[1][1] >= 2


def _ref_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Sennrich apply_bpe reference: each iteration picks the
    lowest-rank pair present and merges all its leftmost
    non-overlapping occurrences in one pass."""
    ranks = {m: i for i, m in enumerate(merges)}
    syms = list(word) + ["</w>"]
    while len(syms) >= 2:
        present = [
            (ranks[(syms[i], syms[i + 1])])
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in ranks
        ]
        if not present:
            break
        a, b = merges[min(present)]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_trie_encoder_matches_expr_chain_k8(spark):
    """encode_word_symbols (heap) == apply_merges_expr (k-replace
    chain) for every distinct corpus word at k=8, and the full
    counts frame is identical between the two encode paths."""
    from claude_readability_hook_spark.operators.bpetrain import (
        bpe_encode_counts_trie,
        encode_word_symbols,
    )

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .limit(80)
    )
    merges_df = learn_bpe_merges(docs, k=8)
    merges = [
        (r["lhs"], r["rhs"])
        for r in merges_df.orderBy("merge_rank").collect()
    ]
    ranks = {m: i for i, m in enumerate(merges)}
    words = sorted(
        {w for r in docs.collect() for w in r["text"].lower().split()}
    )[:200]
    expr_out = (
        spark.createDataFrame([(w,) for w in words], "w string")
        .select("w", apply_merges_expr(F.col("w"), merges).alias("syms"))
        .collect()
    )
    for row in expr_out:
        assert encode_word_symbols(row["w"], ranks) == row["syms"], row["w"]

    a = {
        (r["doc_id"], r["n_words"], r["n_bpe_symbols"])
        for r in bpe_encode_counts(docs, merges).collect()
    }
    b = {
        (r["doc_id"], r["n_words"], r["n_bpe_symbols"])
        for r in bpe_encode_counts_trie(docs, merges_df).collect()
    }
    assert a == b


def test_trie_encoder_matches_sennrich_at_k1000():
    """The heap encoder against the pure-Python Sennrich reference on
    a REAL-SIZE merge table (k=1000): trained in pure Python over a
    seeded synthetic vocabulary, then every training word plus unseen
    words must encode identically."""
    from claude_readability_hook_spark.operators.bpetrain import (
        encode_word_symbols,
    )

    alphabet = "abcdefghijklmnopqrst"
    words: dict[str, int] = {}
    state = 12345
    for n in range(400):
        state = (state * 1103515245 + 12345) % (1 << 31)
        length = 5 + state % 14
        chars = []
        s = state
        for _ in range(length):
            s = (s * 48271) % 2147483647
            chars.append(alphabet[s % len(alphabet)])
        words["".join(chars)] = 1 + state % 9
    trained = _ref_bpe(words, k=1000)
    merges = [(a, b) for a, b, _m, _c in trained]
    assert len(merges) == 1000
    ranks = {m: i for i, m in enumerate(merges)}
    probe = list(words)[:150] + [
        "aaaaa",
        "abcabcabc",
        "tttttttttt",
        "zq",  # chars outside every merge
        "",
    ]
    for w in probe:
        assert encode_word_symbols(w, ranks) == _ref_encode(w, merges), w
        assert "".join(encode_word_symbols(w, ranks)) == w + "</w>"


def test_bpe_vocab_layout(spark):
    """Vocab artifact: base alphabet (sorted chars + marker) gets the
    low ids, merges follow in rank order, ids are dense and unique."""
    from claude_readability_hook_spark.operators.bpetrain import bpe_vocab

    df = spark.createDataFrame(
        [(1, "low low lower")], "doc_id long, text string"
    )
    rows = sorted(bpe_vocab(df, k=3).collect(), key=lambda r: r["token_id"])
    base = [r for r in rows if r["kind"] == "base"]
    merges = [r for r in rows if r["kind"] == "merge"]
    assert [r["token"] for r in base] == sorted(["l", "o", "w", "e", "r", "</w>"])
    assert [r["token_id"] for r in rows] == list(range(len(rows)))
    assert len(merges) == 3
    assert all(m["token_id"] >= len(base) for m in merges)


def test_bpe_artifact_roundtrip_and_versioning(spark, tmp_path):
    """The tokenizer artifact: publish → load is lossless; retraining
    publishes the next snapshot and the prior version stays readable
    (time travel over tokenizer revisions)."""
    from claude_readability_hook_spark.operators.bpetrain import (
        learn_bpe_merges,
        load_bpe_artifact,
        save_bpe_artifact,
    )

    df = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "low low new")],
        "doc_id long, text string",
    )
    m1 = learn_bpe_merges(df, k=3)
    root = str(tmp_path / "tok")
    v1 = save_bpe_artifact(m1, root)
    back = load_bpe_artifact(spark, root)
    key = ["merge_rank", "lhs", "rhs", "merged", "pair_count"]
    assert sorted(map(tuple, back.select(*key).collect())) == sorted(
        map(tuple, m1.select(*key).collect())
    )

    df2 = df.union(
        spark.createDataFrame([(3, "zz zz zz zz zz")], "doc_id long, text string")
    )
    v2 = save_bpe_artifact(learn_bpe_merges(df2, k=3), root, retain_snapshots=2)
    assert v2 == v1 + 1
    # current resolves to the retrained table; v1 is still readable
    cur = load_bpe_artifact(spark, root)
    old = load_bpe_artifact(spark, root, version=v1)
    assert sorted(map(tuple, old.select(*key).collect())) == sorted(
        map(tuple, m1.select(*key).collect())
    )
    assert cur.count() == 3


def test_trained_table_matches_trie_encode(spark):
    """r9: the trainer's final symbol table, unwrapped, must agree
    with the heap/trie encoder applied to a fresh distinct-word scan
    — same (w, n_sym) pairs and the same symbol arrays."""
    from pyspark.sql import functions as F

    from claude_readability_hook_spark.operators.bpetrain import (
        learn_bpe_merges_and_table,
        trained_word_counts,
        trained_word_symbol_arrays,
        trie_encode_word_counts,
        trie_encode_word_symbol_arrays,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges, table = learn_bpe_merges_and_table(docs, k=6)
    toks = F.array_remove(F.split(F.lower("text"), r"\s+"), "")
    distinct = docs.select(F.explode(toks).alias("w")).distinct()
    via_trie = {
        r["w"]: r["n_sym"]
        for r in trie_encode_word_counts(distinct, merges).collect()
    }
    via_table = {
        r["w"]: r["n_sym"] for r in trained_word_counts(table).collect()
    }
    assert via_table == via_trie
    arr_trie = {
        r["w"]: r["syms"]
        for r in trie_encode_word_symbol_arrays(distinct, merges).collect()
    }
    arr_table = {
        r["w"]: r["syms"]
        for r in trained_word_symbol_arrays(table).collect()
    }
    assert arr_table == arr_trie
