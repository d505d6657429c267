"""Streaming perceptual image dedup: gate a crawl's media stream
against the stored hash index, one micro-batch at a time.

foreachBatch + the batch operators (operators/imagededup): each
micro-batch hashes its image payloads scan-side (one decode per
image, payloads never shuffle), probes the STORED band_key-partitioned
index for near-duplicates of anything already kept, splits the batch
into novel / duplicate, writes both sinks, and appends ONLY the novel
hashes as the next index snapshot — the streaming twin of
`media_job --index-root`, and the same foreachBatch reuse pattern as
every other stream here (stream.py extraction, scrub_stream.py,
index_stream.py).

foreachBatch is AT-LEAST-once, so every batch effect is idempotent
under replay: sink rows land in a per-batch directory
(`novel_dir/batch_id=N/`) written with overwrite — a replay after a
mid-batch failure rewrites the same directory instead of
double-appending — and the index append records (stream_id, batch_id)
in the manifest's `applied` map IN the same atomic publish
(imagededup.append_to_image_hash_index mark_batch=), so a replay
whose append already committed skips it. The replayed split itself is
deterministic: image_index_dedup filters self-matches (ref !=
new_ref) and in-batch survivors are pairwise farther than
max_distance apart, so re-probing a store that already holds this
batch's novel hashes reproduces the original novel/dup partition.

In-batch duplicates: the batch also self-pairs (image_dup_pairs) and
keeps each in-batch cluster's min ref, so two copies arriving in the
SAME micro-batch don't both enter the index — the stored-index probe
alone cannot see them. Bootstrap: if no snapshot exists yet, batch 0
builds it (after self-dedup).
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.ann_index import current_manifest
from ..operators.imagededup import (
    append_to_image_hash_index,
    applied_batch,
    build_image_hash_index,
    image_dhash,
    image_dup_pairs,
    image_index_dedup,
)


def dedup_image_stream(
    stream: DataFrame,
    index_root: str,
    novel_dir: str,
    dup_dir: str,
    checkpoint_dir: str,
    max_distance: int = 3,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Start the gate: `stream` carries MEDIA-schema rows; novel image
    rows (first copy of each perceptual cluster, batch- AND
    store-wise) land under novel_dir/batch_id=N, near-duplicates under
    dup_dir/batch_id=N with (match_ref, distance) columns, and the
    index at `index_root` grows by exactly the novel hashes each batch
    (a replayed batch skips the append via the manifest's applied
    marker and overwrites its own sink directories)."""
    stream_id = posixpath.basename(posixpath.normpath(checkpoint_dir)) or "stream"

    def _gate(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        hashes = image_dhash(batch).filter(F.col("decode_ok") == "ok")
        hashes.persist()
        try:
            # in-batch self-dedup: keep each cluster's min ref
            pairs = image_dup_pairs(hashes, max_distance=max_distance)
            batch_losers = (
                pairs.select(
                    F.greatest("ref_a", "ref_b").alias("media_ref"),
                    F.least("ref_a", "ref_b").alias("match_ref"),
                    "distance",
                )
                .groupBy("media_ref")
                .agg(
                    F.min_by("match_ref", "distance").alias("match_ref"),
                    F.min("distance").alias("distance"),
                )
            )
            survivors = hashes.join(batch_losers, "media_ref", "left_anti")
            if current_manifest(index_root) is None:
                dup = batch_losers
                build_image_hash_index(
                    survivors, index_root, mark_batch=(stream_id, batch_id)
                )
            else:
                stored_hits = (
                    image_index_dedup(
                        spark, index_root, survivors, max_distance=max_distance
                    )
                    .groupBy(F.col("new_ref").alias("media_ref"))
                    .agg(
                        F.min_by("stored_ref", "distance").alias("match_ref"),
                        F.min("distance").alias("distance"),
                    )
                )
                stored_hits.persist()
                try:
                    dup = batch_losers.unionByName(stored_hits)
                    survivors = survivors.join(
                        stored_hits, "media_ref", "left_anti"
                    )
                    append_to_image_hash_index(
                        survivors, index_root, mark_batch=(stream_id, batch_id)
                    )
                finally:
                    stored_hits.unpersist()
            novel_rows = batch.join(
                survivors.select("media_ref"), "media_ref", "left_semi"
            ).drop("payload")
            # per-batch dirs + overwrite: a replay rewrites its own
            # output instead of appending a second copy
            novel_rows.write.mode("overwrite").parquet(
                posixpath.join(novel_dir, f"batch_id={batch_id}")
            )
            dup.write.mode("overwrite").parquet(
                posixpath.join(dup_dir, f"batch_id={batch_id}")
            )
        finally:
            hashes.unpersist()

    writer = (
        stream.writeStream.foreachBatch(_gate)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
