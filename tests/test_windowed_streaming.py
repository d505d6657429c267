"""Event-time windowed aggregation: watermark semantics end-to-end —
in-window late rows count, beyond-watermark rows are dropped, and the
streaming result matches the batch twin for on-time data."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from claude_readability_hook_spark.streaming.windowed import windowed_counts

SCHEMA = "ts timestamp, source string"


def _rows(*specs):
    base = dt.datetime(2026, 1, 1, 10, 0, 0)
    return [(base + dt.timedelta(minutes=m), s) for m, s in specs]


def test_streaming_windowed_counts_with_late_data(spark, tmp_path):
    """Append mode — the mode where watermark semantics bite: a late
    row into a still-open window counts; a late row into a finalized
    window is dropped; only watermark-finalized windows are emitted."""
    input_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def run_once():
        stream = spark.readStream.schema(SCHEMA).parquet(input_dir)
        q = (
            windowed_counts(stream, window="10 minutes", watermark="20 minutes")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def emitted():
        try:
            return {
                (r["window_start"].minute, r["source"]): r["n"]
                for r in spark.read.parquet(sink).collect()
            }
        except Exception:
            return {}

    # run 1: on-time events; max event time 10:45 ⇒ watermark 10:25;
    # availableNow flushes state with the updated watermark, so windows
    # ending ≤ 10:25 emit already
    spark.createDataFrame(
        _rows((1, "a"), (2, "a"), (11, "b"), (45, "a")), SCHEMA
    ).coalesce(1).write.mode("append").parquet(input_dir)
    run_once()
    assert emitted() == {(0, "a"): 2, (10, "b"): 1}

    # run 2 (watermark 10:25 from checkpoint): 10:03's window is
    # finalized → DROPPED ((0,a) stays 2); 10:28's window [10:20,10:30)
    # is still open → COUNTS and emits on the flush (watermark 10:30)
    spark.createDataFrame(_rows((28, "b"), (3, "a"), (50, "a")), SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(input_dir)
    run_once()
    assert emitted() == {(0, "a"): 2, (10, "b"): 1, (20, "b"): 1}

    # run 3: clock to 11:20 (watermark 11:00) finalizes the rest; the
    # dropped 10:03 never resurfaces
    spark.createDataFrame(_rows((80, "a"),), SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(input_dir)
    run_once()
    assert emitted() == {
        (0, "a"): 2,
        (10, "b"): 1,
        (20, "b"): 1,
        (40, "a"): 1,
        (50, "a"): 1,
    }


def test_batch_twin_matches_for_on_time_data(spark):
    df = spark.createDataFrame(_rows((1, "a"), (2, "a"), (11, "b"), (45, "a")), SCHEMA)
    got = {
        (r["window_start"].minute, r["source"]): r["n"]
        for r in windowed_counts(df).collect()
    }
    assert got == {(0, "a"): 2, (10, "b"): 1, (40, "a"): 1}
