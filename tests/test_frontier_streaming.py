"""Streaming frontier gate (streaming/frontier_stream.py): two
micro-batches — batch 1 bootstraps the seen-set (in-batch dup keeps
max priority, spam rejected), batch 2's recrawls are dropped against
the STORE while genuinely new URLs schedule; the seen-set records
rejects too, so a spam recrawl never re-runs the gate."""

from __future__ import annotations

from claude_readability_hook_spark.streaming.frontier_stream import (
    gate_frontier_stream,
)


def _urls(spark, rows):
    return spark.createDataFrame(rows, "url string, priority long")


def _run(spark, input_dir, tmp_path):
    q = gate_frontier_stream(
        spark.readStream.schema("url string, priority long")
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir),
        seen_root=str(tmp_path / "seen"),
        scheduled_dir=str(tmp_path / "sched"),
        rejected_dir=str(tmp_path / "rej"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)


def test_frontier_stream_two_batches(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    b1 = [
        ("https://a.example.com/page", 3),
        ("https://a.example.com/page", 9),  # same URL twice → max priority
        ("https://b.example.com/casino/poker", 99),  # spam → rejected
    ]
    _urls(spark, b1).coalesce(1).write.mode("overwrite").parquet(input_dir)
    _run(spark, input_dir, tmp_path)

    sched1 = {
        r["url"]: r["priority"]
        for r in spark.read.parquet(str(tmp_path / "sched")).collect()
    }
    rej1 = {r["url"] for r in spark.read.parquet(str(tmp_path / "rej")).collect()}
    assert sched1 == {"https://a.example.com/page": 9}
    assert rej1 == {"https://b.example.com/casino/poker"}

    # batch 2: recrawl of the good URL AND the spam URL + one new URL
    b2 = [
        ("https://a.example.com/page", 50),  # seen → dropped silently
        ("https://b.example.com/casino/poker", 50),  # seen (as reject) → dropped
        ("https://c.example.com/fresh", 1),
    ]
    _urls(spark, b2).coalesce(1).write.mode("append").parquet(input_dir)
    _run(spark, input_dir, tmp_path)

    sched = {
        r["url"]: (r["priority"], r["batch_id"])
        for r in spark.read.parquet(str(tmp_path / "sched")).collect()
    }
    assert sched == {
        "https://a.example.com/page": (9, 0),
        "https://c.example.com/fresh": (1, 1),
    }
    # the spam recrawl produced NO second rejection row — the seen-set
    # caught it before the gate
    rej = spark.read.parquet(str(tmp_path / "rej")).collect()
    assert {r["url"] for r in rej} == {"https://b.example.com/casino/poker"}
    assert len(rej) == 1
    # seen-set holds all three distinct urls, bucket-partitioned
    seen = spark.read.parquet(str(tmp_path / "seen"))
    assert seen.count() == 3
    assert set(seen.columns) >= {"url", "bucket", "batch_id"}
