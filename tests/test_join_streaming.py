"""Stream-stream join: media spans meet media features across
micro-batches; the event-time range predicate bounds state and drops
features lagging past max_lag."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from claude_readability_hook_spark.streaming.join_stream import (
    join_media_features_stream,
)

SPAN_SCHEMA = "doc_id string, offset int, media_ref string, span_ts timestamp"
FEAT_SCHEMA = "media_ref string, feature array<float>, feat_ts timestamp"


def _t(minute):
    return datetime(2026, 1, 1, 12, minute, 0)


def test_stream_stream_join_matches_within_lag(spark, tmp_path):
    spans_dir = str(tmp_path / "spans")
    feats_dir = str(tmp_path / "feats")

    spans = [
        ("d1", 1, "img:a", _t(0)),
        ("d2", 1, "img:b", _t(1)),
        ("d3", 1, "img:late", _t(2)),
    ]
    # feature rows: a arrives promptly, b in a later file (second
    # micro-batch), late arrives 40 min after its span (outside max_lag)
    spark.createDataFrame(
        [("img:a", [0.5, 0.5], _t(1))], FEAT_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(feats_dir)
    spark.createDataFrame(
        [("img:b", [1.0, 0.0], _t(3)), ("img:late", [0.0, 1.0], _t(42))],
        FEAT_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(feats_dir)
    spark.createDataFrame(spans, SPAN_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(spans_dir)

    s_stream = (
        spark.readStream.schema(SPAN_SCHEMA).option("maxFilesPerTrigger", 1).parquet(spans_dir)
    )
    f_stream = (
        spark.readStream.schema(FEAT_SCHEMA).option("maxFilesPerTrigger", 1).parquet(feats_dir)
    )
    joined = join_media_features_stream(
        s_stream, f_stream, watermark="5 minutes", max_lag="15 minutes"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = {
        r["media_ref"]: r for r in spark.sql("SELECT * FROM ss_join_out").collect()
    }
    assert set(rows) == {"img:a", "img:b"}  # late feature excluded by range
    assert rows["img:a"]["doc_id"] == "d1"
    assert [round(v, 3) for v in rows["img:b"]["feature"]] == [1.0, 0.0]
