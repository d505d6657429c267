"""Streaming exact dedup: replayed/recrawled duplicates drop at ingest;
watermarked mode keeps state bounded while still catching in-window
duplicates."""

from __future__ import annotations

import pyspark.sql.functions as F

from claude_readability_hook_spark.schemas import DOCUMENTS
from claude_readability_hook_spark.sources.corpus import fixture_rows
from claude_readability_hook_spark.streaming.dedup_stream import (
    content_hash_expr,
    stream_exact_dedup,
)


def _write_batch(spark, path, rows, mode):
    spark.createDataFrame(rows, schema=DOCUMENTS).coalesce(1).write.mode(mode).parquet(path)


def test_unbounded_stream_dedup_drops_recrawls(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    rows = fixture_rows()[:4]
    _write_batch(spark, input_dir, rows, "overwrite")
    # recrawl: same content under new doc_ids, plus one genuinely new doc
    recrawl = [dict(r, doc_id=r["doc_id"] + "_again") for r in rows[:3]]
    recrawl.append(fixture_rows()[5])
    _write_batch(spark, input_dir, recrawl, "append")

    stream = spark.readStream.schema(DOCUMENTS).option("maxFilesPerTrigger", 1).parquet(input_dir)
    q = (
        stream_exact_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT doc_id, dup_hash FROM dedup_out").collect()
    hashes = [r["dup_hash"] for r in out]
    assert len(hashes) == len(set(hashes))  # no duplicate content survived
    assert len(out) == 5  # 4 originals + 1 new; 3 recrawls dropped


def test_content_hash_respects_span_boundaries(spark):
    """Separator framing: equal concatenations split at different span
    offsets must NOT collide; identical span sequences under different
    doc_ids must."""

    def doc(doc_id, texts):
        return {
            "doc_id": doc_id,
            "url": "https://x/",
            "host": "x",
            "n_bytes": sum(len(t) for t in texts),
            "spans": [
                {"kind": "text", "text": t, "media_ref": "", "offset": i}
                for i, t in enumerate(texts)
            ],
        }

    df = spark.createDataFrame(
        [
            doc("a", ["foo", "bar"]),
            doc("b", ["foob", "ar"]),  # same concatenation, different split
            doc("c", ["foo", "bar"]),  # true duplicate of a
        ],
        schema=DOCUMENTS,
    )
    h = {r["doc_id"]: r["h"] for r in df.select("doc_id", content_hash_expr().alias("h")).collect()}
    assert h["a"] == h["c"]
    assert h["a"] != h["b"]


def test_watermarked_dedup_bounded_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark: in-window duplicate dropped, and
    the plan carries the watermark (the bounded-state evidence)."""
    from pyspark.sql.types import StringType, StructField, StructType

    input_dir = str(tmp_path / "in_wm")
    rows = [dict(r, ts="2026-01-01 10:00:00") for r in fixture_rows()[:3]]
    rows += [dict(rows[0], doc_id="dup_again", ts="2026-01-01 10:10:00")]
    # COPY the schema — StructType.add mutates in place and would
    # pollute the shared DOCUMENTS schema for every later test
    schema = StructType(list(DOCUMENTS.fields) + [StructField("ts", StringType())])
    spark.createDataFrame(rows, schema=schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).coalesce(1).write.mode("overwrite").parquet(input_dir)

    stream = spark.readStream.schema(
        spark.read.parquet(input_dir).schema
    ).parquet(input_dir)
    q = (
        stream_exact_dedup(stream, event_time_col="ts", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_wm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT doc_id FROM dedup_wm").collect()
    ids = {r["doc_id"] for r in out}
    assert "dup_again" not in ids and len(ids) == 3
