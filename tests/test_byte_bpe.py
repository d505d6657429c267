"""Byte-level (GPT-2-style) BPE: hand-computed merges over multibyte
UTF-8 text, a pure-Python Sennrich-on-bytes differential, encode-path
equivalence (expr chain vs heap), UTF-8 losslessness of learned
tokens, and the byte-budget packing mode."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from claude_readability_hook_spark.operators.bpetrain import (
    apply_byte_merges_expr,
    byte_bpe_encode_counts,
    byte_bpe_encode_counts_trie,
    encode_pretoken_byte_symbols,
    learn_byte_bpe_merges,
)


def _pretokens(text: str) -> list[str]:
    ws = text.split()
    return [w if i == 0 else " " + w for i, w in enumerate(ws)]


def _byte_syms(pretoken: str) -> tuple[str, ...]:
    h = pretoken.encode("utf-8").hex().upper()
    return tuple(h[i : i + 2] for i in range(0, len(h), 2))


def _ref_byte_bpe(texts: list[str], k: int):
    """Sennrich loop over pretoken byte-symbol tuples: leftmost
    non-overlapping merge, tie-break (count desc, 'lhs rhs' asc), no
    end-of-word marker (space marker carries the boundary)."""
    vocab: collections.Counter = collections.Counter()
    for t in texts:
        for pt in _pretokens(t):
            vocab[_byte_syms(pt)] += 1
    merges = []
    for _ in range(k):
        stats: collections.Counter = collections.Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += n
        if not stats:
            break
        best = min(
            stats.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )
        (a, b), cnt = best
        merges.append((a, b, a + b, cnt))
        new_vocab: collections.Counter = collections.Counter()
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += n
        vocab = new_vocab
    return merges


def _ref_encode(pretoken: str, merges: list[tuple[str, str]]) -> list[str]:
    syms = list(_byte_syms(pretoken))
    for a, b in merges:
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


MULTIBYTE_CORPUS = [
    (1, "der Bär der Bär im Tal"),
    (2, "こんにちは世界 こんにちは"),
    (3, "café café crème der Bär"),
    (4, "the cat the cat the hat"),
]


def _corpus_df(spark):
    return spark.createDataFrame(
        MULTIBYTE_CORPUS, "doc_id long, text string"
    )


def test_byte_merges_match_reference_on_multibyte(spark):
    """learn_byte_bpe_merges == pure-Python Sennrich-on-bytes on a
    corpus with hiragana + diacritics, ranks 1..12 exactly."""
    texts = [t for _, t in MULTIBYTE_CORPUS]
    want = _ref_byte_bpe(texts, k=12)
    rows = (
        learn_byte_bpe_merges(_corpus_df(spark), k=12)
        .orderBy("merge_rank")
        .collect()
    )
    got = [(r["lhs"], r["rhs"], r["merged"], r["pair_count"]) for r in rows]
    assert got == want


def test_byte_merges_reassemble_utf8(spark):
    """Learned merges are built from contiguous byte runs, so every
    `merged` string unhexes to a byte string that occurs literally in
    some pretoken's UTF-8 encoding — tokens never straddle pretokens."""
    rows = learn_byte_bpe_merges(_corpus_df(spark), k=12).collect()
    pretoken_bytes = [
        pt.encode("utf-8")
        for _, t in MULTIBYTE_CORPUS
        for pt in _pretokens(t)
    ]
    for r in rows:
        tok = bytes.fromhex(r["merged"])
        assert any(tok in pb for pb in pretoken_bytes), r["merged"]


def test_byte_encode_paths_agree_and_lossless(spark):
    """expr-chain encode == heap encode for every distinct pretoken;
    concatenated symbols unhex back to the exact pretoken bytes
    (byte-level BPE is lossless, no <unk>); counts frames identical
    between the two encode paths, including on UNSEEN multibyte text."""
    df = _corpus_df(spark)
    merges_df = learn_byte_bpe_merges(df, k=10)
    merges = [
        (r["lhs"], r["rhs"])
        for r in merges_df.orderBy("merge_rank").collect()
    ]
    ranks = {m: i for i, m in enumerate(merges)}
    pts = sorted(
        {pt for _, t in MULTIBYTE_CORPUS for pt in _pretokens(t)}
    ) + [" naïve", "未知の語", " zzz"]
    expr_out = (
        spark.createDataFrame([(p,) for p in pts], "pt string")
        .select(
            "pt", apply_byte_merges_expr(F.col("pt"), merges).alias("syms")
        )
        .collect()
    )
    for row in expr_out:
        heap = encode_pretoken_byte_symbols(row["pt"], ranks)
        assert heap == row["syms"], row["pt"]
        assert heap == _ref_encode(row["pt"], merges), row["pt"]
        assert bytes.fromhex("".join(heap)) == row["pt"].encode("utf-8")

    unseen = df.unionByName(
        spark.createDataFrame(
            [(9, "naïve 未知の語 zzz")], "doc_id long, text string"
        )
    )
    a = {
        tuple(r)
        for r in byte_bpe_encode_counts(unseen, merges).collect()
    }
    b = {
        tuple(r)
        for r in byte_bpe_encode_counts_trie(unseen, merges_df).collect()
    }
    assert a == b
    by_doc = {r[0]: r for r in a}
    # multibyte doc: 2 pretokens, symbols bounded by byte count
    assert by_doc[2][1] == 2
    assert by_doc[2][2] <= len("こんにちは世界 こんにちは".encode())


def test_pack_byte_budget_boundaries(spark):
    """pack_assignments_byte_bpe charges the learned byte budget and
    the boundary arithmetic replays the per-shard running sum."""
    from claude_readability_hook_spark.operators.packing import (
        pack_assignments_byte_bpe,
    )

    df = _corpus_df(spark).withColumn(
        "source", F.when(F.col("doc_id") % 2 == 0, "even").otherwise("odd")
    )
    merges_df = learn_byte_bpe_merges(df, k=6)
    counts = {
        r["doc_id"]: r["n_bpe_symbols"]
        for r in byte_bpe_encode_counts_trie(df, merges_df).collect()
    }
    out = pack_assignments_byte_bpe(df, merges_df, seq_len=16).collect()
    assert {r["doc_id"] for r in out} == set(counts)
    cum: dict[str, int] = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["doc_id"])):
        n = counts[r["doc_id"]]
        assert r["n_tokens"] == n
        start = cum.get(r["shard"], 0)
        assert r["pack_first"] == start // 16
        assert r["start_offset"] == start % 16
        end = start + n
        assert r["pack_last"] == (
            (end - 1) // 16 if n > 0 else start // 16
        )
        cum[r["shard"]] = end
