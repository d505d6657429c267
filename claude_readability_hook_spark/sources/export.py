"""Training-shard export sink: extracted documents → size-bounded
JSONL shards, the hand-off format a downstream training pipeline
consumes.

Sharding is row-count-based and deterministic: shard id =
xxhash64(doc_id) mod n_shards (content-addressed, so re-exports of the
same corpus land rows in the same shards — diffable, resumable).
n_shards derives from a single count() job (documented driver-side
agg; at 10^12 docs the count comes from table metadata/stats instead).
One file per shard via repartition on the shard key; writer-side
maxRecordsPerFile is the belt-and-braces cap.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def render_text_expr() -> F.Column:
    """Flatten output spans to training text: text spans verbatim, code
    spans fenced, media spans as their placeholder token — join '\\n\\n'."""
    piece = lambda s: (
        F.when(s["kind"] == "text", s["text"])
        .when(s["kind"] == "code", F.concat(F.lit("```\n"), s["text"], F.lit("\n```")))
        .otherwise(F.concat(F.lit("<media:"), s["media_ref"], F.lit(">")))
    )
    return F.array_join(
        F.filter(
            F.transform("spans", piece), lambda p: p.isNotNull() & (F.length(p) > 0)
        ),
        "\n\n",
    )


def export_jsonl_shards(
    extracted: DataFrame,
    path: str,
    max_rows_per_shard: int = 100_000,
    compression: str = "gzip",
) -> int:
    """Write (doc_id, title, engine, score, text) JSONL shards; returns
    the shard count. Only successful extractions export."""
    rows = extracted.filter(F.col("success")).select(
        "doc_id",
        "title",
        "engine",
        F.round("score", 4).alias("score"),
        render_text_expr().alias("text"),
    )
    # The sizing count() plus the write is two executions of the input
    # plan. Reading from a committed table that's cheap; but a
    # non-materialized frame (extraction UDF, catalog=None) would run
    # the full UDF twice — materialize the narrow projection once
    # first (ADVICE r2).
    try:
        file_backed = bool(extracted.inputFiles())
    except Exception:
        file_backed = False
    if not file_backed:
        rows = rows.localCheckpoint(eager=True)
    n = rows.count()
    n_shards = max(1, math.ceil(n / max_rows_per_shard))
    (
        rows.withColumn("shard", F.pmod(F.xxhash64("doc_id"), F.lit(n_shards)))
        .repartition(n_shards, "shard")
        .drop("shard")
        .write.mode("overwrite")
        .option("compression", compression)
        .option("maxRecordsPerFile", max_rows_per_shard)
        .json(path)
    )
    return n_shards


def _write_shard_files(recs: DataFrame, path: str, compression: str) -> None:
    """One output FILE per shard key, guaranteed: partitionBy('shard')
    separates shard values into shard=<val>/ directories regardless of
    hash placement, and the preceding repartition(cardinality, 'shard')
    bounds the task count so each shard's records sit in one task —
    exactly one file per directory (a hash collision merely co-locates
    two shards in one task, which still writes one file into EACH
    shard's directory). A bare repartition(n, 'shard') alone does NOT
    give one-file-per-shard: hash partitioning n keys into n partitions
    routinely collides distinct shards into shared files. Pack order
    inside each file is preserved by the pre-write sort.

    Consumer contract (Hive layout): the shard key lives in the
    shard=<val>/ DIRECTORY name, not in the JSON records —
    spark.read.json(path) restores it as a partition column, and
    non-Spark training loaders read it from the path (the
    webdataset/HF-datasets convention)."""
    n_shards = recs.select("shard").distinct().count()
    (
        recs.repartition(max(n_shards, 1), "shard")
        .sortWithinPartitions("shard", "pack_id")
        .write.mode("overwrite")
        .partitionBy("shard")
        .option("compression", compression)
        .json(path)
    )


def export_packed_shards(
    docs: DataFrame,
    path: str,
    seq_len: int = 512,
    shard_col: str = "source",
    text_col: str = "text",
    compression: str = "gzip",
) -> int:
    """Packed-sequence export (operators/packing.py): JSONL records
    (shard, pack_id, n, tokens, docs) where `docs` is the ordered
    doc-boundary metadata (doc_id, pack-local start, token count) a
    trainer needs to mask cross-document attention. One output file
    per shard key (the pack stream is shard-local by construction),
    pack order preserved within each file by the pre-write sort.
    Returns the pack count (one count() on the narrow record frame —
    the documented sizing agg, same contract as export_jsonl_shards)."""
    from ..operators.packing import pack_records

    recs = pack_records(docs, seq_len, shard_col, text_col)
    n_packs = recs.count()
    _write_shard_files(recs, path, compression)
    return n_packs


def export_bpe_packed_shards(
    docs: DataFrame,
    merges: DataFrame,
    path: str,
    seq_len: int = 512,
    shard_col: str = "source",
    text_col: str = "text",
    compression: str = "gzip",
) -> int:
    """Packed-sequence export in the LEARNED tokenizer's symbols
    (operators/packing.pack_bpe_records): the training-ready payload —
    each JSONL record carries seq_len trained-BPE symbols plus the
    doc-boundary metadata for cross-document attention masking. Same
    per-shard-file layout and sizing discipline as
    export_packed_shards."""
    from ..operators.packing import pack_bpe_records

    recs = pack_bpe_records(docs, merges, seq_len, shard_col, text_col)
    n_packs = recs.count()
    _write_shard_files(recs, path, compression)
    return n_packs


def export_unigram_packed_shards(
    docs: DataFrame,
    vocab: DataFrame,
    path: str,
    seq_len: int = 512,
    shard_col: str = "source",
    text_col: str = "text",
    compression: str = "gzip",
) -> int:
    """export_bpe_packed_shards with the UNIGRAM tokenizer's pieces
    (operators/packing.pack_unigram_records) — same record shape,
    same per-shard-file layout."""
    from ..operators.packing import pack_unigram_records

    recs = pack_unigram_records(docs, vocab, seq_len, shard_col, text_col)
    n_packs = recs.count()
    _write_shard_files(recs, path, compression)
    return n_packs
