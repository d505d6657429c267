"""Streaming perceptual image dedup (streaming/image_stream.py): two
micro-batches through the foreachBatch gate — batch 1 bootstraps the
stored index (after in-batch self-dedup), batch 2's re-encodes and
twins are caught against the STORE; the index grows by exactly the
novel hashes."""

from __future__ import annotations

from pyspark.sql import functions as F

from claude_readability_hook_spark.core.imagecodec import encode_png
from claude_readability_hook_spark.operators.ann_index import (
    current_manifest,
    read_index,
)
from claude_readability_hook_spark.operators.multimodal import MEDIA
from claude_readability_hook_spark.streaming.image_stream import (
    dedup_image_stream,
)


def _img_row(ref, grid):
    return {
        "media_ref": ref, "modality": "image", "payload": encode_png(grid),
        "width": len(grid[0]), "height": len(grid), "duration_ms": None,
        "mime": "image/png",
    }


def _ramp(slope_x, base=0):
    return [
        [min(255, base + slope_x * x + 4 * y) for x in range(24)]
        for y in range(16)
    ]


def _run_stream(spark, input_dir, tmp_path):
    q = dedup_image_stream(
        spark.readStream.schema(MEDIA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir),
        index_root=str(tmp_path / "idx"),
        novel_dir=str(tmp_path / "novel"),
        dup_dir=str(tmp_path / "dups"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)


def test_stream_gate_two_batches(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    # batch 1: two distinct images + an in-batch near-copy of the first
    b1 = [
        _img_row("a", _ramp(8)),
        _img_row("a_copy", _ramp(8, base=1)),  # near-identical ramp
        _img_row("b", _ramp(-8, base=230)),
    ]
    spark.createDataFrame(b1, schema=MEDIA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(input_dir)
    _run_stream(spark, input_dir, tmp_path)

    novel1 = {
        r["media_ref"]
        for r in spark.read.parquet(str(tmp_path / "novel")).collect()
    }
    dups1 = {
        r["media_ref"]: r["match_ref"]
        for r in spark.read.parquet(str(tmp_path / "dups")).collect()
    }
    assert novel1 == {"a", "b"}
    assert dups1 == {"a_copy": "a"}  # in-batch cluster keeps the min ref
    m1 = current_manifest(str(tmp_path / "idx"))
    idx_refs = {
        r["ref"]
        for r in read_index(spark, str(tmp_path / "idx"), m1).collect()
    }
    assert idx_refs == {"a", "b"}

    # batch 2: a re-encode of 'a' (store hit), one genuinely new image
    b2 = [
        _img_row("a_again", _ramp(8)),
        _img_row("c", _ramp(12, base=40)),
    ]
    spark.createDataFrame(b2, schema=MEDIA).coalesce(1).write.mode(
        "append"
    ).parquet(input_dir)
    _run_stream(spark, input_dir, tmp_path)

    novel = {
        r["media_ref"]
        for r in spark.read.parquet(str(tmp_path / "novel")).collect()
    }
    dups = {
        r["media_ref"]: r["match_ref"]
        for r in spark.read.parquet(str(tmp_path / "dups")).collect()
    }
    assert novel == {"a", "b", "c"}
    assert dups["a_again"] == "a"  # caught against the STORE
    m2 = current_manifest(str(tmp_path / "idx"))
    idx_refs2 = {
        r["ref"]
        for r in read_index(spark, str(tmp_path / "idx"), m2).collect()
    }
    assert idx_refs2 == {"a", "b", "c"}  # grew by exactly the novel hash
    assert len(m2["dirs"]) == 2  # bootstrap snapshot + one append

    # idempotency plumbing: each batch recorded its applied marker in
    # the SAME publish as its data dir, and sinks are per-batch dirs
    from claude_readability_hook_spark.operators.imagededup import (
        applied_batch,
    )

    assert applied_batch(str(tmp_path / "idx"), "ckpt") == 1
    assert (tmp_path / "novel" / "batch_id=0").exists()
    assert (tmp_path / "novel" / "batch_id=1").exists()

    # a foreachBatch REPLAY of batch 1 (at-least-once) must not grow
    # the index: mark_batch sees applied >= batch_id and no-ops
    from claude_readability_hook_spark.operators.imagededup import (
        append_to_image_hash_index,
        image_dhash,
    )

    replay = image_dhash(
        spark.createDataFrame([_img_row("c", _ramp(12, base=40))], schema=MEDIA)
    ).filter(F.col("decode_ok") == "ok")
    append_to_image_hash_index(
        replay, str(tmp_path / "idx"), mark_batch=("ckpt", 1)
    )
    m3 = current_manifest(str(tmp_path / "idx"))
    assert len(m3["dirs"]) == 2  # unchanged: replay skipped
    # a genuinely NEW batch still appends and advances the marker
    append_to_image_hash_index(
        replay, str(tmp_path / "idx"), mark_batch=("ckpt", 2)
    )
    m4 = current_manifest(str(tmp_path / "idx"))
    assert len(m4["dirs"]) == 3
    assert applied_batch(str(tmp_path / "idx"), "ckpt") == 2
