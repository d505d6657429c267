"""Custom stateful streaming operator: applyInPandasWithState.

The batch pipeline dedupes replays via the committed-output anti-join;
a continuously-running stream can instead keep per-key state in the
engine. This module implements streaming sessionization — the stateful
analog of operators/sessions.py — as the demonstration of
applyInPandasWithState (state schema, timeout handling, incremental
update semantics):

  per user_id, maintain (n_events, n_sessions, last_ts); an incoming
  event that arrives more than `gap` after last_ts opens a new session;
  a processing-time timeout flushes idle users' final counts.

At 10^12-event scale the state store shards by key across executors;
the update function below touches only the keys present in each
micro-batch.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

SESSION_STATE = StructType(
    [
        StructField("n_events", LongType(), False),
        StructField("n_sessions", LongType(), False),
        StructField("last_ts", LongType(), False),  # epoch seconds
    ]
)

SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("n_sessions", LongType(), False),
    ]
)

GAP_SECONDS = 1800
IDLE_TIMEOUT_MS = 5_000  # processing-time idle eviction


def update_sessions(
    key: Tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """State-update function for applyInPandasWithState.

    Emits the running (user_id, n_events, n_sessions) after each
    micro-batch touch; evicts state on idle timeout."""
    (user_id,) = key

    if state.hasTimedOut:
        n_events, n_sessions, _ = state.get
        state.remove()
        yield pd.DataFrame(
            [{"user_id": user_id, "n_events": n_events, "n_sessions": n_sessions}]
        )
        return

    if state.exists:
        n_events, n_sessions, last_ts = state.get
    else:
        n_events, n_sessions, last_ts = 0, 0, None

    ts_values: list[int] = []
    for batch in batches:
        ts_values.extend(int(v) for v in batch["ts_sec"])
    ts_values.sort()

    for ts in ts_values:
        if last_ts is None or ts - last_ts > GAP_SECONDS:
            n_sessions += 1
        n_events += 1
        last_ts = ts

    state.update((n_events, n_sessions, last_ts if last_ts is not None else 0))
    state.setTimeoutDuration(IDLE_TIMEOUT_MS)
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": n_events, "n_sessions": n_sessions}]
    )


def stream_sessionize(events_stream, checkpoint_dir: str, output_path: str):
    """events readStream → stateful per-user session counts.

    `events_stream` must provide (user_id, ts) columns; ts is projected
    to epoch seconds BEFORE the stateful operator so state stays narrow.
    Each micro-batch's updated counts append to `output_path` stamped
    with batch_id — the latest batch_id per user is the current total
    (update-mode semantics over an append-only file sink)."""
    from pyspark.sql import functions as F

    narrow = events_stream.select(
        "user_id", F.col("ts").cast("timestamp").cast("long").alias("ts_sec")
    )
    counted = narrow.groupBy("user_id").applyInPandasWithState(
        update_sessions,
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )

    def sink(batch_df, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            output_path
        )

    return (
        counted.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
    )
