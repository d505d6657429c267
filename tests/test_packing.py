"""Sequence packing: boundary arithmetic, the lossless round-trip
(no token lost or reordered), and exact pack sizes."""

from __future__ import annotations

from pyspark.sql import functions as F

from claude_readability_hook_spark.operators.packing import (
    pack_assignments,
    pack_token_sequences,
)

SF_DIR = "/root/testdata/sf0.001"


def _tiny(spark):
    # shard A stream: d1 (3 toks) + d2 (4) + d4 (6) = 13 → packs of 5:
    # [0,5) [5,10) [10,13); d3 is empty and owns no positions
    return spark.createDataFrame(
        [
            (1, "A", "a b c"),
            (2, "A", "d e f g"),
            (3, "A", ""),
            (4, "A", "h i j k l m"),
            (5, "B", "x y"),
        ],
        "doc_id long, source string, text string",
    )


def test_boundary_arithmetic(spark):
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["pack_first"],
            r["pack_last"],
            r["start_offset"],
        )
        for r in pack_assignments(_tiny(spark), seq_len=5).collect()
    }
    assert got == {
        1: (3, 0, 0, 0),  # [0,3)
        2: (4, 0, 1, 3),  # [3,7) straddles packs 0→1
        3: (0, 1, 1, 2),  # empty doc at stream pos 7
        4: (6, 1, 2, 2),  # [7,13) straddles 1→2
        5: (2, 0, 0, 0),  # shard B has its own stream
    }


def test_roundtrip_no_token_lost(spark):
    """Every pack is exactly seq_len except each shard's last, and the
    concatenation of packs (in pack order) equals the concatenation of
    docs (in doc_id order) — concat+split loses nothing."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    L = 128
    packs = pack_token_sequences(docs, seq_len=L).collect()
    by_shard: dict[str, list] = {}
    for r in packs:
        by_shard.setdefault(r["shard"], []).append(r)
        assert r["n"] == len(r["tokens"])
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["pack_id"])
        assert [r["pack_id"] for r in rows] == list(range(len(rows)))
        for r in rows[:-1]:
            assert r["n"] == L
        assert 1 <= rows[-1]["n"] <= L
        stream = [t for r in rows for t in r["tokens"]]
        want = [
            t
            for doc in sorted(
                docs.filter(F.col("source") == shard).collect(),
                key=lambda d: d["doc_id"],
            )
            for t in doc["text"].split()
        ]
        assert stream == want


def test_assignment_consistent_with_materialization(spark):
    """pack_first/pack_last from the arithmetic view match where the
    materialized packs actually put each doc's first/last token."""
    df = _tiny(spark)
    asg = {r["doc_id"]: r for r in pack_assignments(df, seq_len=5).collect()}
    packs = {
        (r["shard"], r["pack_id"]): r["tokens"]
        for r in pack_token_sequences(df, seq_len=5).collect()
    }
    # doc 2's tokens d..g: first in (A,0) at offset 3, last in (A,1)
    assert packs[("A", 0)][asg[2]["start_offset"]] == "d"
    assert packs[("A", asg[2]["pack_last"])][
        (asg[2]["start_offset"] + asg[2]["n_tokens"] - 1) % 5
    ] == "g"


def test_doc_boundaries_tile_each_pack_exactly(spark):
    """Per pack: segments are ordered, disjoint, start at 0, tile the
    pack's token count exactly, and agree with the materialized
    sequences; re-slicing each pack's tokens by its boundaries
    reproduces every doc's token run."""
    from claude_readability_hook_spark.operators.packing import pack_records

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    L = 96
    recs = sorted(
        pack_records(docs, seq_len=L).collect(),
        key=lambda r: (r["shard"], r["pack_id"]),
    )
    assert recs
    doc_tokens: dict[int, list[str]] = {}
    for r in recs:
        segs = r["docs"]
        pos = 0
        for s in segs:
            assert s["start"] == pos
            pos += s["n"]
            doc_tokens.setdefault(s["doc_id"], []).extend(
                r["tokens"][s["start"] : s["start"] + s["n"]]
            )
        assert pos == r["n"] == len(r["tokens"])
    want = {
        r["doc_id"]: r["text"].split()
        for r in docs.collect()
        if r["text"].split()
    }
    assert doc_tokens == want


def test_export_packed_shards_roundtrip(spark, tmp_path):
    from claude_readability_hook_spark.sources.export import export_packed_shards

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "source", "text")
        .limit(100)
    )
    out = str(tmp_path / "packed")
    n = export_packed_shards(docs, out, seq_len=128)
    back = spark.read.json(out)
    assert back.count() == n
    assert set(back.columns) >= {"shard", "pack_id", "n", "tokens", "docs"}
    # the one-file-per-shard invariant is REAL: partitionBy separates
    # shard values into dirs, repartition bounds each dir to one task
    import glob

    shard_dirs = glob.glob(f"{out}/shard=*")
    assert shard_dirs
    for d in shard_dirs:
        files = [f for f in glob.glob(f"{d}/part-*") if not f.endswith(".crc")]
        assert len(files) == 1, d
    # every non-final pack per shard is exactly seq_len
    rows = back.select("shard", "pack_id", "n").collect()
    last = {}
    for r in rows:
        last[r["shard"]] = max(last.get(r["shard"], -1), r["pack_id"])
    for r in rows:
        if r["pack_id"] != last[r["shard"]]:
            assert r["n"] == 128


def test_custom_count_expr_budget(spark):
    """count_expr swaps the budget unit (tokenizer counts instead of
    whitespace words): doubling every doc's count doubles the stream
    positions exactly."""
    from claude_readability_hook_spark.operators.packing import pack_assignments
    from claude_readability_hook_spark.operators.textcommon import tokens_expr

    df = _tiny(spark)
    base = {
        r["doc_id"]: r
        for r in pack_assignments(df, seq_len=10).collect()
    }
    doubled = {
        r["doc_id"]: r
        for r in pack_assignments(
            df, seq_len=10,
            count_expr=F.size(tokens_expr(F.col("text"))) * 2,
        ).collect()
    }
    for d, r in doubled.items():
        assert r["n_tokens"] == base[d]["n_tokens"] * 2
    # doc 4 (6→12 tokens after docs 1-3 contribute 14) straddles:
    # begin 14, end 26 → packs 1..2
    assert (doubled[4]["pack_first"], doubled[4]["pack_last"]) == (1, 2)
    assert doubled[4]["start_offset"] == 4


def test_two_level_prefix_sum_bit_identical_with_giant_shard(spark):
    """The r5 verdict's giant-shard answer: bucket_span packing must
    equal the single-window path EXACTLY, including on a corpus where
    one shard dwarfs the rest (the case the rewrite exists for), with
    sparse/shuffled doc_ids and empty docs in the mix."""
    from claude_readability_hook_spark.operators.packing import (
        pack_assignments,
        pack_records,
    )

    rows = [
        (i * 37 + 5, "giant", " ".join(f"w{i}x{j}" for j in range(1 + i % 17)))
        for i in range(600)
    ]
    rows += [(100_000 + i, f"s{i % 3}", f"tok a{i} b{i}") for i in range(60)]
    rows += [(200_000, "giant", ""), (200_001, "s0", "")]  # empty docs
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    plain = sorted(map(tuple, pack_assignments(df, seq_len=64).collect()))
    for span in (16, 64, 1_000_000):  # incl. span > all ids (1 bucket)
        bucketed = sorted(
            map(tuple, pack_assignments(df, seq_len=64, bucket_span=span).collect())
        )
        assert bucketed == plain, f"span={span}"

    # the materialized records (tokens + boundaries) agree too
    def norm(recs):
        return sorted(
            (r["shard"], r["pack_id"], r["n"], tuple(r["tokens"]),
             tuple(map(tuple, r["docs"])))
            for r in recs
        )

    assert norm(pack_records(df, seq_len=64, bucket_span=32).collect()) == norm(
        pack_records(df, seq_len=64).collect()
    )


def test_two_level_plan_windows_are_bucket_bounded(spark):
    """Plan shape: with bucket_span, no window partitions by shard
    alone — the doc-level running sum keys on (shard, bucket), so no
    task ever sorts a whole shard; the shard-only window that remains
    runs over per-BUCKET rows (the second level)."""
    from claude_readability_hook_spark.operators.packing import pack_assignments

    df = spark.createDataFrame(
        [(i, "one_shard", "a b c") for i in range(50)],
        "doc_id long, source string, text string",
    )
    plan = pack_assignments(df, seq_len=8, bucket_span=16)._jdf.queryExecution().executedPlan().toString()
    import re

    windows = re.findall(r"Window .*?windowspecdefinition\(([^)]*)\)", plan)
    assert windows, plan
    doc_level = [w for w in windows if "bucket" in w]
    assert doc_level, f"no bucket-partitioned window in plan:\n{plan}"


def test_pack_by_learned_bpe_counts(spark):
    """The learned-merge budget: boundaries computed from the trained
    tokenizer's true per-doc symbol counts — consistent with running
    the heap encoder + boundary arithmetic by hand, and distinct from
    the whitespace budget whenever merges fire."""
    from claude_readability_hook_spark.operators.bpetrain import (
        bpe_encode_counts_trie,
        learn_bpe_merges,
    )
    from claude_readability_hook_spark.operators.packing import (
        pack_assignments,
        pack_assignments_learned_bpe,
    )

    df = spark.createDataFrame(
        [
            (1, "s", "low lower lowest low low"),
            (2, "s", "new newer newest new"),
            (3, "s", "low new low new low"),
            (4, "s", ""),
        ],
        "doc_id long, source string, text string",
    )
    merges = learn_bpe_merges(df, k=4)
    got = {
        r["doc_id"]: r
        for r in pack_assignments_learned_bpe(df, merges, seq_len=8).collect()
    }
    counts = {
        r["doc_id"]: r["n_bpe_symbols"]
        for r in bpe_encode_counts_trie(df, merges).collect()
    }
    cum = 0
    for d in (1, 2, 3, 4):
        n = counts[d]
        assert got[d]["n_tokens"] == n
        assert got[d]["pack_first"] == cum // 8
        assert got[d]["start_offset"] == cum % 8
        last = (cum + n - 1) // 8 if n else cum // 8
        assert got[d]["pack_last"] == last
        cum += n
    # the learned budget differs from the whitespace one (merges fired)
    ws = {r["doc_id"]: r["n_tokens"] for r in pack_assignments(df, seq_len=8).collect()}
    assert any(counts[d] != ws[d] for d in (1, 2, 3))
    # bucketed path identical here too
    b = sorted(map(tuple, pack_assignments_learned_bpe(df, merges, seq_len=8, bucket_span=2).collect()))
    assert b == sorted(map(tuple, (got[d] for d in got)))


def test_pack_bpe_symbol_stream_matches_reference(spark):
    """The materialized symbol stream: flattening the packs in order
    reproduces exactly the per-doc, per-word heap-encoder output, each
    pack is full but the shard's last, and the learned-count
    boundaries describe the same stream."""
    from claude_readability_hook_spark.operators.bpetrain import (
        encode_word_symbols,
        learn_bpe_merges,
        merge_ranks,
    )
    from claude_readability_hook_spark.operators.packing import (
        pack_assignments_learned_bpe,
        pack_bpe_symbol_records,
    )

    df = spark.createDataFrame(
        [
            (1, "s", "low lower lowest low"),
            (2, "s", "new newest low"),
            (3, "s", ""),
            (4, "t", "lower newer"),
        ],
        "doc_id long, source string, text string",
    )
    merges = learn_bpe_merges(df, k=4)
    ranks = merge_ranks(merges)

    # reference stream per shard: docs in doc_id order, words in order
    texts = {1: "low lower lowest low", 2: "new newest low", 3: "", 4: "lower newer"}
    shards = {"s": [1, 2, 3], "t": [4]}
    ref_stream = {}
    for sh, ids in shards.items():
        syms = []
        for d in ids:
            for w in texts[d].lower().split():
                syms += encode_word_symbols(w, ranks)
        ref_stream[sh] = syms

    recs = pack_bpe_symbol_records(df, merges, seq_len=8).collect()
    got = {}
    for r in sorted(recs, key=lambda r: (r["shard"], r["pack_id"])):
        got.setdefault(r["shard"], []).extend(r["tokens"])
        last = max(x["pack_id"] for x in recs if x["shard"] == r["shard"])
        if r["pack_id"] != last:
            assert r["n"] == 8
    assert got == ref_stream

    # boundaries agree with the same stream
    a = pack_assignments_learned_bpe(df, merges, seq_len=8)
    totals = {r["shard"]: 0 for r in a.collect()}
    for r in a.collect():
        totals[r["shard"]] += r["n_tokens"]
    assert totals == {sh: len(s) for sh, s in ref_stream.items()}

    # two-level path identical
    recs2 = pack_bpe_symbol_records(df, merges, seq_len=8, bucket_span=2).collect()
    norm = lambda rs: sorted((r["shard"], r["pack_id"], tuple(r["tokens"])) for r in rs)
    assert norm(recs2) == norm(recs)
