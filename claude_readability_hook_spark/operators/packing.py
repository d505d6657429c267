"""Sequence packing for pretraining export: concatenate documents (in
deterministic doc_id order) into fixed token-budget sequences, split
exactly at the budget boundary — the standard packing step between a
curated corpus and training shards (one doc per JSONL record wastes
budget on padding; packed sequences don't).

Reference analog: none — LLM-data-pipeline brief (the export side of
sources/export.export_jsonl_shards).

Semantics (concat + split): per shard, documents form one continuous
token stream in doc_id order; sequence i owns stream positions
[i·L, (i+1)·L). A document therefore maps to a contiguous stream
interval and may straddle sequence boundaries — pack_first/pack_last/
start_offset are pure running-sum arithmetic, exact integers, and the
DuckDB twin is the same frame-ordered window (deterministic by the
repo's oracle rules: int window sums over ROWS UNBOUNDED PRECEDING).

Scale shape: a GLOBAL running sum would serialize 10^12 docs through
one window partition — the classic window scale-killer. Packing does
not need global contiguity (training shards are independent), so the
stream is per-shard: the window partitions by `shard_col` (default
`source`) and orders by doc_id — one hash shuffle on the shard key,
then embarrassingly parallel windows; pack ids are shard-local and
(shard, pack_id) is globally unique.

Giant-shard answer (r5 verdict's named residual, now IN the operator
instead of a re-shard-upstream note): `bucket_span=N` switches the
running sum to a TWO-LEVEL prefix sum — grouped.py's histogram-cumsum
pattern. Docs bucket by doc_id div N (order-respecting, so bucket
order == stream order); per-(shard, bucket) token sums aggregate
map-side into one narrow row per bucket; the bucket-offset running
sum windows over BUCKET rows (data volume / N — the second level
shrinks the serialized window by the span factor; a third level is
the same trick again if ever needed); offsets broadcast-join back and
the within-bucket window partitions by (shard, bucket) — every sort
bounded by the span, no task ever serializes a whole shard. Output is
bit-identical to the single-window path (same cum), so the oracle
does not move. The materialization path (pack_token_sequences)
explodes per token; that is the export's output volume itself, not
overhead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textcommon import tokens_expr


def _with_stream_cum(
    t: DataFrame, bucket_span: int | None, broadcast_offsets: bool = True
) -> DataFrame:
    """Add `cum` — the INCLUSIVE running token sum in (shard, doc_id
    stream order) — to a narrow (doc_id, shard, n_tokens, …) frame.

    bucket_span=None (default): one window per shard — the small-shard
    fast path; the whole shard serializes through one task's sort.
    bucket_span=N: two-level prefix sum (module docstring): bucket =
    doc_id div N respects doc_id order, per-bucket sums window over
    bucket ROWS only, and the within-bucket window's sort is bounded
    by the span. Requires doc_id castable to BIGINT (the corpus
    contract); identical `cum` either way. broadcast_offsets=False
    flips the offsets join to shuffle — the offsets table has one row
    per non-empty bucket, so broadcast is right until shards × buckets
    outgrows the executors."""
    if bucket_span is None:
        return t.withColumn(
            "cum",
            F.sum("n_tokens").over(
                Window.partitionBy("shard")
                .orderBy("doc_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    b = t.withColumn(
        "bucket", F.expr(f"CAST(doc_id AS BIGINT) div {bucket_span}")
    )
    offsets = (
        b.groupBy("shard", "bucket")
        .agg(F.sum("n_tokens").alias("bsum"))
        .withColumn(
            "boff",
            F.coalesce(
                F.sum("bsum").over(
                    Window.partitionBy("shard")
                    .orderBy("bucket")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("shard", "bucket", "boff")
    )
    if broadcast_offsets:
        offsets = F.broadcast(offsets)
    return (
        b.join(offsets, ["shard", "bucket"])
        .withColumn(
            "cum",
            F.sum("n_tokens").over(
                Window.partitionBy("shard", "bucket")
                .orderBy("doc_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            + F.col("boff"),
        )
        .drop("bucket", "boff")
    )


def pack_assignments(
    df: DataFrame,
    seq_len: int = 512,
    shard_col: str = "source",
    text_col: str = "text",
    count_expr: F.Column | None = None,
    bucket_span: int | None = None,
) -> DataFrame:
    """(doc_id, shard, n_tokens, pack_first, pack_last, start_offset):
    where each doc's tokens land in the packed stream. pack_last is
    inclusive; zero-token docs occupy no positions (pack_last ==
    pack_first == the pack their start falls in).

    `count_expr` swaps the budget unit: default is whitespace tokens,
    but a real training shard budgets by TOKENIZER counts — pass e.g.
    textstats' BPE-regex count (`sequence_pack_bpe` does) or a
    learned-merge symbol count. Pure arithmetic either way; only the
    per-doc length column changes. `bucket_span` switches the running
    sum to the two-level prefix sum (giant-shard path — see
    _with_stream_cum); the output is bit-identical."""
    n_tokens = (
        count_expr
        if count_expr is not None
        else F.size(tokens_expr(F.col(text_col)))
    )
    t = df.select(
        "doc_id",
        F.col(shard_col).alias("shard"),
        n_tokens.cast("long").alias("n_tokens"),
    )
    return _boundaries(_with_stream_cum(t, bucket_span), seq_len)


def _boundaries(c: DataFrame, seq_len: int) -> DataFrame:
    """The pack-boundary arithmetic over a cum-annotated stream frame —
    shared by every budget source (whitespace, regex, learned BPE)."""
    begin = F.col("cum") - F.col("n_tokens")
    return c.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.expr(f"(cum - n_tokens) div {seq_len}").alias("pack_first"),
        F.when(
            F.col("n_tokens") > 0, F.expr(f"(cum - 1) div {seq_len}")
        )
        .otherwise(F.expr(f"(cum - n_tokens) div {seq_len}"))
        .alias("pack_last"),
        (begin % seq_len).alias("start_offset"),
    )


def pack_assignments_learned_bpe(
    df: DataFrame,
    merges: DataFrame,
    seq_len: int = 512,
    shard_col: str = "source",
    text_col: str = "text",
    bucket_span: int | None = None,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Packing budgeted by the LEARNED merge table's TRUE symbol
    counts — the budget the trained tokenizer actually charges (the
    BPE-regex count in sequence_pack_bpe is the pre-training
    approximation; this is the post-training exact number). Per-doc
    counts come from bpetrain.bpe_encode_counts_trie: the heap encoder
    runs once per DISTINCT word against the merge DataFrame (any k),
    counts broadcast-join back, and only a narrow (doc_id, n) stream
    reaches the packing window — so the merge-table size never touches
    the window stage. Same boundary arithmetic, same two-level
    bucket_span option."""
    from .bpetrain import bpe_encode_counts_trie

    if counts is None:
        counts = bpe_encode_counts_trie(df, merges, text_col)
    t = df.select("doc_id", F.col(shard_col).alias("shard")).join(
        counts.select(
            "doc_id", F.col("n_bpe_symbols").cast("long").alias("n_tokens")
        ),
        "doc_id",
    )
    return _boundaries(_with_stream_cum(t, bucket_span), seq_len)


def pack_assignments_unigram(
    df: DataFrame,
    vocab: DataFrame,
    seq_len: int = 512,
    shard_col: str = "source",
    text_col: str = "text",
    bucket_span: int | None = None,
) -> DataFrame:
    """Packing budgeted by the UNIGRAM-LM tokenizer's true piece
    counts (operators/unigram.py) — the fourth budget source next to
    whitespace, BPE-regex and learned-BPE. Per-doc counts come from
    unigram.unigram_token_counts (distinct-pretoken Viterbi, counts
    broadcast-join back); only a narrow (doc_id, n) stream reaches
    the packing window. Same boundary arithmetic, same two-level
    bucket_span option."""
    from .unigram import unigram_token_counts

    counts = unigram_token_counts(df, vocab, text_col=text_col)
    t = df.select("doc_id", F.col(shard_col).alias("shard")).join(
        counts.select("doc_id", "n_tokens"), "doc_id"
    )
    return _boundaries(_with_stream_cum(t, bucket_span), seq_len)


def pack_token_sequences(
    df: DataFrame,
    seq_len: int = 512,
    shard_col: str = "source",
    text_col: str = "text",
    bucket_span: int | None = None,
) -> DataFrame:
    """Materialize the packed sequences: (shard, pack_id, n, tokens)
    with every pack exactly seq_len tokens except each shard's last.
    Token order inside a pack is the stream order (doc_id, then
    in-doc position) — the array_sort-on-struct reassembly keeps it
    exact without a per-pack window. `bucket_span` bounds the window
    sorts for giant shards (two-level prefix sum); here the token
    arrays ride through the bounded (shard, bucket) window instead of
    one whole-shard task, which matters MORE than on the assignments
    path because these rows carry the text."""
    toks = tokens_expr(F.col(text_col))
    # materialize ts BEFORE taking its size — an inlined tokenizer
    # re-evaluates per reference (the repo-wide zip_with lesson)
    base = df.select(
        "doc_id", F.col(shard_col).alias("shard"), toks.alias("ts")
    ).withColumn("n_tokens", F.size("ts").cast("long"))
    t = _with_stream_cum(base, bucket_span).withColumn(
        "begin", F.col("cum") - F.col("n_tokens")
    )
    # per-doc pack SEGMENTS, not one row per token (r9 — the
    # _symbol_stream_to_packs shape): each doc slices its token array
    # once per pack it covers; segments tile a pack contiguously, so
    # flatten in pstart order IS the position sort. Bit-identical,
    # ~seq_len× fewer rows on the dominant exchange — and these rows
    # carry the text, so it matters more here than on the symbol path.
    lo = F.greatest(F.col("pack_id") * seq_len - F.col("begin"), F.lit(0))
    hi = F.least(
        F.col("n_tokens"), (F.col("pack_id") + 1) * seq_len - F.col("begin")
    )
    segs = (
        t.filter(F.col("n_tokens") > 0)
        .select(
            "shard",
            "ts",
            "n_tokens",
            "begin",
            F.explode(
                F.sequence(
                    F.expr(f"begin div {seq_len}"),
                    F.expr(f"(begin + n_tokens - 1) div {seq_len}"),
                )
            ).alias("pack_id"),
        )
        .select(
            "shard",
            "pack_id",
            (F.col("begin") + lo - F.col("pack_id") * seq_len).alias("pstart"),
            F.slice("ts", lo + 1, hi - lo).alias("seg"),
        )
    )
    return segs.groupBy("shard", "pack_id").agg(
        F.sum(F.size("seg")).cast("long").alias("n"),
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("pstart"), F.col("seg")))),
                lambda s: s["seg"],
            )
        ).alias("tokens"),
    )


def pack_doc_boundaries(
    df: DataFrame,
    seq_len: int = 512,
    shard_col: str = "source",
    text_col: str = "text",
    bucket_span: int | None = None,
) -> DataFrame:
    """(shard, pack_id, docs) — per pack, the ordered doc segments it
    contains: array<struct<doc_id, start, n>> with `start` the pack-
    local position and `n` the token count this pack holds of that
    doc. Pure arithmetic over pack_assignments (a doc spanning packs
    explodes to one row per covered pack — ≤ ceil(n_tokens/L)+1 rows);
    the downstream trainer uses it to mask cross-document attention
    inside packed sequences."""
    a = pack_assignments(
        df, seq_len, shard_col, text_col, bucket_span=bucket_span
    )
    return _doc_boundaries_from_assignments(a, seq_len)


def _doc_boundaries_from_assignments(a: DataFrame, seq_len: int) -> DataFrame:
    """The per-pack boundary rollup over ANY assignments frame —
    shared by the whitespace and learned-BPE budget sources."""
    a = a.filter(F.col("n_tokens") > 0)
    begin = F.col("pack_first") * seq_len + F.col("start_offset")
    e = a.select(
        "shard",
        "doc_id",
        "n_tokens",
        begin.alias("beg"),
        (begin + F.col("n_tokens")).alias("fin"),
        F.explode(F.sequence("pack_first", "pack_last")).alias("pack_id"),
    )
    lo = F.greatest(F.col("beg"), F.col("pack_id") * seq_len)
    hi = F.least(F.col("fin"), (F.col("pack_id") + 1) * seq_len)
    seg = e.select(
        "shard",
        "pack_id",
        F.struct(
            (lo - F.col("pack_id") * seq_len).cast("long").alias("start"),
            F.col("doc_id"),
            (hi - lo).cast("long").alias("n"),
        ).alias("seg"),
    )
    return seg.groupBy("shard", "pack_id").agg(
        F.transform(
            F.array_sort(F.collect_list("seg")),
            lambda s: F.struct(
                s["doc_id"].alias("doc_id"),
                s["start"].alias("start"),
                s["n"].alias("n"),
            ),
        ).alias("docs")
    )


def pack_records(
    df: DataFrame,
    seq_len: int = 512,
    shard_col: str = "source",
    text_col: str = "text",
    bucket_span: int | None = None,
) -> DataFrame:
    """The full packed-export record: (shard, pack_id, n, tokens,
    docs) — materialized sequences joined with their doc-boundary
    metadata on the narrow (shard, pack_id) key."""
    seqs = pack_token_sequences(df, seq_len, shard_col, text_col, bucket_span)
    bounds = pack_doc_boundaries(df, seq_len, shard_col, text_col, bucket_span)
    return seqs.join(bounds, ["shard", "pack_id"])


def pack_bpe_symbol_records(
    df: DataFrame,
    merges: DataFrame,
    seq_len: int = 512,
    shard_col: str = "source",
    text_col: str = "text",
    bucket_span: int | None = None,
    broadcast_vocab: bool = True,
    word_syms: DataFrame | None = None,
) -> DataFrame:
    """Materialize packed LEARNED-BPE SYMBOL sequences — the actual
    training-shard payload: (shard, pack_id, n, tokens) where tokens
    are the trained tokenizer's symbols (end-of-word markers included)
    in exact stream order, every pack seq_len long but each shard's
    last. The boundary arithmetic is pack_assignments_learned_bpe's,
    so counts, boundaries and the materialized stream all agree.

    Plan: distinct words heap-encode ONCE against the merge DataFrame
    (any k — trie_encode_word_symbol_arrays), the symbol arrays
    broadcast-join back to the doc words, and every position is a sum
    of three exact integers — doc begin (the shard-level stream cum,
    two-level bucketed under bucket_span), word begin (a window over
    the words of ONE doc — doc-bounded by construction), symbol index
    (posexplode). The only wide rows are the final per-pack collects,
    which are the export's own output volume."""
    from .bpetrain import trie_encode_word_symbol_arrays

    # tokenize WITH the shard column in one projection — joining the
    # word table back to df for the shard would re-scan the corpus
    # (r6 plan audit caught the SortMergeJoin self-join)
    toks = F.transform(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")),
        F.lower,
    )
    words = df.select(
        "doc_id", F.col(shard_col).alias("shard"), toks.alias("ws")
    )
    if word_syms is None:
        # no trainer table supplied (pre-trained merges from an
        # artifact): heap-encode a fresh distinct-word frame
        word_syms = trie_encode_word_symbol_arrays(
            words.select(F.explode("ws").alias("w")).distinct(), merges
        )
    if broadcast_vocab:
        word_syms = F.broadcast(word_syms)
    wrows = (
        words.select(
            "doc_id", "shard", F.posexplode("ws").alias("widx", "w")
        )
        .join(word_syms, "w")
        .select(
            "doc_id",
            "shard",
            "widx",
            "syms",
            F.size("syms").cast("long").alias("n_sym"),
        )
    )
    return _symbol_stream_to_packs(wrows, seq_len, bucket_span)


def _symbol_stream_to_packs(
    wrows: DataFrame, seq_len: int, bucket_span: int | None
) -> DataFrame:
    """The shared position arithmetic from a (doc_id, shard, widx,
    syms, n_sym) word-row frame to packed (shard, pack_id, n, tokens)
    records — tokenizer-family-agnostic.

    Deliberately NOT checkpointed: the frame is referenced by the
    per-doc assembly and the narrow count agg, but its rows carry the
    symbol arrays — materializing the full stream once was measured
    2.5× SLOWER than letting the two cheap narrow references recompute
    their scan+broadcast-join lineage (r9).

    Shuffle shape (r9 second pass): one row per DOC-PACK SEGMENT, not
    one row per symbol. Each doc's symbol array is assembled once by a
    (doc_id) hash agg (array_sort on widx keeps stream order exact —
    no window, so corpus arrays never ride a sort-by-key window), the
    narrow per-doc counts run the usual stream cum, and each doc
    explodes into the ≤ ceil(n/L)+1 packs it covers with an array
    SLICE per pack. The final (shard, pack_id) agg sorts ~docs-per-
    pack struct rows instead of seq_len per-symbol rows and flattens —
    positions tile contiguously, so flatten in pstart order IS the
    position sort. Bit-identical output, ~seq_len× fewer shuffled rows
    on the dominant exchange."""
    doc_syms = wrows.groupBy("doc_id", "shard").agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("widx", "syms"))),
                lambda s: s["syms"],
            )
        ).alias("syms_all"),
        F.sum("n_sym").cast("long").alias("n_tokens"),
    )
    # doc begin within its shard stream: the learned-count cum over the
    # NARROW count table (re-derived from wrows — see docstring)
    doc_counts = wrows.groupBy("doc_id", "shard").agg(
        F.sum("n_sym").cast("long").alias("n_tokens")
    )
    doc_begin = _with_stream_cum(doc_counts, bucket_span).select(
        "doc_id", "shard", (F.col("cum") - F.col("n_tokens")).alias("dbegin")
    )
    lo = F.greatest(F.col("pack_id") * seq_len - F.col("dbegin"), F.lit(0))
    hi = F.least(
        F.col("n_tokens"), (F.col("pack_id") + 1) * seq_len - F.col("dbegin")
    )
    segs = (
        doc_syms.join(doc_begin, ["doc_id", "shard"])
        .filter(F.col("n_tokens") > 0)
        .select(
            "shard",
            "syms_all",
            "n_tokens",
            "dbegin",
            F.explode(
                F.sequence(
                    F.expr(f"dbegin div {seq_len}"),
                    F.expr(f"(dbegin + n_tokens - 1) div {seq_len}"),
                )
            ).alias("pack_id"),
        )
        .select(
            "shard",
            "pack_id",
            (F.col("dbegin") + lo - F.col("pack_id") * seq_len).alias("pstart"),
            F.slice("syms_all", lo + 1, hi - lo).alias("seg"),
        )
    )
    return segs.groupBy("shard", "pack_id").agg(
        F.sum(F.size("seg")).cast("long").alias("n"),
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("pstart"), F.col("seg")))),
                lambda s: s["seg"],
            )
        ).alias("tokens"),
    )


def pack_bpe_records(
    df: DataFrame,
    merges: DataFrame,
    seq_len: int = 512,
    shard_col: str = "source",
    text_col: str = "text",
    bucket_span: int | None = None,
) -> DataFrame:
    """The full learned-tokenizer packed record: (shard, pack_id, n,
    tokens, docs) — materialized SYMBOL sequences joined with their
    doc-boundary metadata, both derived from the same learned counts
    so stream and boundaries agree by construction."""
    seqs = pack_bpe_symbol_records(
        df, merges, seq_len, shard_col, text_col, bucket_span
    )
    bounds = _doc_boundaries_from_assignments(
        pack_assignments_learned_bpe(
            df, merges, seq_len, shard_col, text_col, bucket_span
        ),
        seq_len,
    )
    return seqs.join(bounds, ["shard", "pack_id"])


def pack_unigram_symbol_records(
    df: DataFrame,
    vocab: DataFrame,
    seq_len: int = 512,
    shard_col: str = "source",
    text_col: str = "text",
    bucket_span: int | None = None,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """pack_bpe_symbol_records with the UNIGRAM tokenizer's pieces:
    distinct words Viterbi-segment once (unigram.segment_words), the
    piece arrays broadcast-join back, and the identical three-integer
    position arithmetic materializes the packed streams. Counts,
    boundaries and stream agree by construction because both derive
    from the same segmentations."""
    from .unigram import segment_words

    toks = F.transform(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")),
        F.lower,
    )
    words = df.select(
        "doc_id", F.col(shard_col).alias("shard"), toks.alias("ws")
    )
    word_syms = segment_words(
        words.select(F.explode("ws").alias("w")).distinct(), vocab
    )
    if broadcast_vocab:
        word_syms = F.broadcast(word_syms)
    wrows = (
        words.select(
            "doc_id", "shard", F.posexplode("ws").alias("widx", "w")
        )
        .join(word_syms, "w")
        .select(
            "doc_id",
            "shard",
            "widx",
            "syms",
            F.size("syms").cast("long").alias("n_sym"),
        )
    )
    return _symbol_stream_to_packs(wrows, seq_len, bucket_span)


def pack_unigram_records(
    df: DataFrame,
    vocab: DataFrame,
    seq_len: int = 512,
    shard_col: str = "source",
    text_col: str = "text",
    bucket_span: int | None = None,
) -> DataFrame:
    """(shard, pack_id, n, tokens, docs) — the full unigram packed
    record: materialized piece sequences + doc-boundary metadata,
    both from the same segmentations (the pack_bpe_records shape)."""
    seqs = pack_unigram_symbol_records(
        df, vocab, seq_len, shard_col, text_col, bucket_span
    )
    bounds = _doc_boundaries_from_assignments(
        pack_assignments_unigram(
            df, vocab, seq_len, shard_col, text_col, bucket_span
        ),
        seq_len,
    )
    return seqs.join(bounds, ["shard", "pack_id"])


def pack_assignments_byte_bpe(
    df: DataFrame,
    merges: DataFrame,
    seq_len: int = 512,
    shard_col: str = "source",
    text_col: str = "text",
    bucket_span: int | None = None,
    counts: DataFrame | None = None,
) -> DataFrame:
    """pack_assignments_learned_bpe's BYTE-level mode (r7): the budget
    a trained byte-level (GPT-2-style) tokenizer charges — per-doc
    counts from bpetrain.byte_bpe_encode_counts_trie (heap encoder
    over the distinct-pretoken table, any merge-table size, counts
    broadcast-joined back), then the same boundary arithmetic and
    two-level bucket_span option. Only a narrow (doc_id, n) stream
    reaches the packing window."""
    from .bpetrain import byte_bpe_encode_counts_trie

    if counts is None:
        counts = byte_bpe_encode_counts_trie(df, merges, text_col)
    t = df.select("doc_id", F.col(shard_col).alias("shard")).join(
        counts.select(
            "doc_id", F.col("n_bpe_symbols").cast("long").alias("n_tokens")
        ),
        "doc_id",
    )
    return _boundaries(_with_stream_cum(t, bucket_span), seq_len)
