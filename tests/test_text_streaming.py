"""Streaming near-dup text gate (streaming/text_stream.py): two
micro-batches through the foreachBatch gate — batch 1 bootstraps the
stored minhash index (after in-batch self-dedup), batch 2's recrawl
and paraphrase are caught against the STORE; the index grows by
exactly the novel signatures and a replayed append no-ops."""

from __future__ import annotations

from claude_readability_hook_spark.operators.ann_index import (
    current_manifest,
    read_index,
)
from claude_readability_hook_spark.streaming.text_stream import (
    dedup_text_stream,
)

BASE = (
    "spark shuffles the narrow columns while the broadcast side ships "
    "whole to every executor and the scan prunes partitions early"
)
OTHER = "completely different content about medieval pottery glazes kilns " * 2
THIRD = "novel third topic entirely about rivers deltas and sediment flows"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def _run_stream(spark, input_dir, tmp_path):
    q = dedup_text_stream(
        spark.readStream.schema("doc_id string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir),
        index_root=str(tmp_path / "idx"),
        novel_dir=str(tmp_path / "novel"),
        dup_dir=str(tmp_path / "dups"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)


def test_text_stream_gate_two_batches(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    # batch 1: two distinct docs + an in-batch paraphrase of the first
    b1 = [("a", BASE), ("a_copy", BASE + " early"), ("b", OTHER)]
    _docs(spark, b1).coalesce(1).write.mode("overwrite").parquet(input_dir)
    _run_stream(spark, input_dir, tmp_path)

    novel1 = {
        r["doc_id"] for r in spark.read.parquet(str(tmp_path / "novel")).collect()
    }
    dups1 = {
        r["doc_id"]: r["match_id"]
        for r in spark.read.parquet(str(tmp_path / "dups")).collect()
    }
    assert novel1 == {"a", "b"}
    assert dups1 == {"a_copy": "a"}  # in-batch cluster keeps the min id
    m1 = current_manifest(str(tmp_path / "idx"))
    idx_ids = {
        r["doc_id"]
        for r in read_index(spark, str(tmp_path / "idx"), m1).collect()
    }
    assert idx_ids == {"a", "b"}

    # batch 2: an exact recrawl of 'a' (store hit) + a genuinely new doc
    b2 = [("a_again", BASE), ("c", THIRD)]
    _docs(spark, b2).coalesce(1).write.mode("append").parquet(input_dir)
    _run_stream(spark, input_dir, tmp_path)

    novel = {
        r["doc_id"] for r in spark.read.parquet(str(tmp_path / "novel")).collect()
    }
    dups = {
        r["doc_id"]: (r["match_id"], r["n_matching"])
        for r in spark.read.parquet(str(tmp_path / "dups")).collect()
    }
    assert novel == {"a", "b", "c"}
    assert dups["a_again"] == ("a", 12)  # exact recrawl: all 12 agree
    m2 = current_manifest(str(tmp_path / "idx"))
    idx_ids2 = {
        r["doc_id"]
        for r in read_index(spark, str(tmp_path / "idx"), m2).collect()
    }
    assert idx_ids2 == {"a", "b", "c"}  # grew by exactly the novel sigs
    assert len(m2["dirs"]) == 2  # bootstrap snapshot + one append

    # idempotency plumbing: applied marker advanced in the same publish,
    # sinks are per-batch dirs, and a replayed append no-ops
    from claude_readability_hook_spark.operators.imagededup import applied_batch
    from claude_readability_hook_spark.operators.textindex import (
        append_to_text_minhash_index,
    )

    assert applied_batch(str(tmp_path / "idx"), "ckpt") == 1
    assert (tmp_path / "novel" / "batch_id=0").exists()
    assert (tmp_path / "novel" / "batch_id=1").exists()

    replay = _docs(spark, [("c", THIRD)])
    append_to_text_minhash_index(
        replay, str(tmp_path / "idx"), mark_batch=("ckpt", 1)
    )
    m3 = current_manifest(str(tmp_path / "idx"))
    assert len(m3["dirs"]) == 2  # unchanged: replay skipped
    append_to_text_minhash_index(
        replay, str(tmp_path / "idx"), mark_batch=("ckpt", 2)
    )
    m4 = current_manifest(str(tmp_path / "idx"))
    assert len(m4["dirs"]) == 3  # a genuinely new batch still appends
    assert applied_batch(str(tmp_path / "idx"), "ckpt") == 2
