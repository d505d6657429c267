"""applyInPandasWithState: streaming sessionization must converge to
the batch sessionize() result when fed the same events across multiple
micro-batches (state carried between batches)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from claude_readability_hook_spark.operators.sessions import sessionize
from claude_readability_hook_spark.streaming.stateful import stream_sessionize


def test_stateful_stream_matches_batch_sessionize(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").filter(
        F.col("user_id") < 20
    )

    # two files split on the time axis (streaming sessionization assumes
    # in-order arrival); maxFilesPerTrigger=1 → two micro-batches
    # sharing state across the boundary
    ts_sec = F.col("ts").cast("timestamp").cast("long")  # ts is NTZ
    cutoff = events.agg(F.percentile(ts_sec, F.lit(0.5)).alias("c")).collect()[0]["c"]
    input_dir = str(tmp_path / "in")
    events.filter(ts_sec <= cutoff).coalesce(1).write.mode("append").parquet(input_dir)
    events.filter(ts_sec > cutoff).coalesce(1).write.mode("append").parquet(input_dir)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    out_dir = str(tmp_path / "out")
    q = stream_sessionize(stream, str(tmp_path / "ckpt"), out_dir).start()
    # availableNow + stateful timeouts keeps the query alive to honor
    # evictions — poll for both micro-batches' output, then stop
    import time

    deadline = time.time() + 150
    while time.time() < deadline:
        try:
            if spark.read.parquet(out_dir).agg(F.max("batch_id")).collect()[0][0] >= 1:
                break
        except Exception:
            pass
        time.sleep(2)
    q.stop()

    # latest batch_id per user = final running counts
    out = spark.read.parquet(out_dir)
    latest = (
        out.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "user_id"
                ).orderBy(F.desc("batch_id"))
            ),
        )
        .filter("rn = 1")
        .select("user_id", "n_events", "n_sessions")
    )
    got = {r["user_id"]: (r["n_events"], r["n_sessions"]) for r in latest.collect()}

    want = {
        r["user_id"]: (r["n_events"], r["n_sessions"])
        for r in sessionize(events, gap_seconds=1800).collect()
    }
    assert got == want
    assert len(got) > 0
