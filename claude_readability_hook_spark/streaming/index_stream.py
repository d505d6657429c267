"""Streaming ANN-index maintenance: keep the materialized IVF index
current as embeddings arrive, one micro-batch at a time.

foreachBatch + operators.ann_index.append_to_ivf_index: each batch's
vectors are assigned to the EXISTING centroids (broadcast literals —
no shuffle) and appended into the centroid_id partition layout.
Queries probing the index between batches see every committed batch
(parquet appends are atomic at file granularity; the probe's partition
pruning is unaffected by file count). Checkpointing gives
exactly-once-per-batch appends on restart — the streaming twin of the
batch build/append split, and the same foreachBatch reuse pattern as
streaming/stream.py uses for extraction.

Centroid drift over a long-running stream is handled OUT of band by a
periodic build_ivf_index rebuild (swap the path), not in-stream —
retraining inside a micro-batch would stall the trigger cadence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.ann_index import append_to_ivf_index, load_ivf_centroids


def maintain_ivf_index(
    stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    centroids: list[list[float]] | None = None,
    vec_col: str = "embedding",
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Start the maintenance query: every micro-batch of (vec_id,
    embedding) appends into the index at `index_path`. Pass centroids
    explicitly to pin a trained set; default loads the index's own
    artifact once, driver-side."""
    if centroids is None:
        centroids = load_ivf_centroids(index_path)

    def _append(batch: DataFrame, _batch_id: int) -> None:
        append_to_ivf_index(batch, index_path, centroids=centroids, vec_col=vec_col)

    writer = (
        stream.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
