"""Streaming NEAR-duplicate text gate: filter a crawl's document
stream against the stored minhash index, one micro-batch at a time —
the text twin of image_stream (exact-hash recrawls are cheaper to
drop earlier via dedup_stream; this catches paraphrases/boilerplate
variants the content hash cannot).

foreachBatch + the batch operators (operators/textindex): each
micro-batch signs its documents in-row, probes the STORED
band_pk-partitioned index (static partition filter from the batch's
own band keys — stored text never moves), splits novel vs duplicate,
writes both sinks, and appends ONLY the novel signatures as the next
index snapshot.

Idempotence under foreachBatch's at-least-once replay — the
image_stream discipline exactly:
  - sink rows land in per-batch directories (`novel_dir/batch_id=N/`)
    written with overwrite: a replay rewrites its own output instead
    of double-appending;
  - the index append records (stream_id, batch_id) in the manifest's
    `applied` map IN the same atomic publish
    (textindex.append_to_text_minhash_index mark_batch=), so a replay
    whose append already committed skips it;
  - the replayed split is deterministic: text_index_dedup hides
    same-id matches by default, and in-batch survivors share no full
    band with each other, so re-probing a store that already holds
    this batch's novel signatures reproduces the original partition.

In-batch near-duplicates: the batch self-pairs through the SAME
banded machinery (probe the batch's own band rows) and keeps each
collision pair's min doc_id, so two paraphrases arriving in one
micro-batch don't both enter the index — the stored-index probe alone
cannot see them. Bootstrap: if no snapshot exists yet, batch 0 builds
it (after self-dedup).
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.ann_index import current_manifest
from ..operators.textindex import (
    TEXTINDEX_BAND_SIZE,
    TEXTINDEX_NUM_HASHES,
    _text_band_rows,
    append_to_text_minhash_index,
    build_text_minhash_index,
    text_index_dedup,
)


def _batch_self_losers(
    batch: DataFrame,
    num_hashes: int,
    band_size: int,
    text_col: str,
    n: int,
) -> DataFrame:
    """(doc_id, match_id, n_matching): in-batch banded collisions,
    keep-min-id rule — each colliding doc reports its EARLIEST
    lower-id partner and the best agreement count seen (possibly from
    different partners: the gate needs existence of a dup, not
    attribution; min/max are deterministic where ordered picks over
    string ids are not). Signatures ride the band rows in-row; the
    only shuffle is the banded equi-join on (band_idx, band_key)."""
    rows = _text_band_rows(batch, num_hashes, band_size, text_col, n).select(
        "band_idx", "band_key", "doc_id", "sig"
    )
    other = rows.select(
        "band_idx",
        "band_key",
        F.col("doc_id").alias("o_id"),
        F.col("sig").alias("o_sig"),
    )
    matches = F.size(
        F.filter(F.zip_with("sig", "o_sig", lambda a, b: a == b), lambda x: x)
    ).cast("long")
    return (
        rows.join(other, ["band_idx", "band_key"])
        .filter(F.col("o_id") < F.col("doc_id"))
        .select("doc_id", F.col("o_id").alias("match_id"), matches.alias("nm"))
        .groupBy("doc_id")
        .agg(
            F.min("match_id").alias("match_id"),
            F.max("nm").alias("n_matching"),
        )
    )


def dedup_text_stream(
    stream: DataFrame,
    index_root: str,
    novel_dir: str,
    dup_dir: str,
    checkpoint_dir: str,
    num_hashes: int = TEXTINDEX_NUM_HASHES,
    band_size: int = TEXTINDEX_BAND_SIZE,
    shingle_n: int = 3,
    text_col: str = "text",
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Start the gate: `stream` carries (doc_id, text, ...) rows;
    novel documents land under novel_dir/batch_id=N, near-duplicates
    under dup_dir/batch_id=N with (match_id, n_matching) columns, and
    the index at `index_root` grows by exactly the novel signatures
    each batch (a replayed batch skips the append via the manifest's
    applied marker and overwrites its own sink directories)."""
    stream_id = posixpath.basename(posixpath.normpath(checkpoint_dir)) or "stream"

    def _gate(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        batch.persist()
        try:
            losers = _batch_self_losers(
                batch, num_hashes, band_size, text_col, shingle_n
            )
            losers.persist()
            try:
                survivors = batch.join(losers, "doc_id", "left_anti")
                if current_manifest(index_root) is None:
                    dup = losers
                    build_text_minhash_index(
                        survivors,
                        index_root,
                        num_hashes,
                        band_size,
                        text_col=text_col,
                        n=shingle_n,
                        mark_batch=(stream_id, batch_id),
                    )
                else:
                    stored_hits = (
                        text_index_dedup(
                            spark, index_root, survivors, text_col=text_col
                        )
                        .groupBy(F.col("new_id").alias("doc_id"))
                        .agg(
                            F.min("stored_id").alias("match_id"),
                            F.max("n_matching").alias("n_matching"),
                        )
                    )
                    stored_hits.persist()
                    try:
                        dup = losers.unionByName(stored_hits)
                        survivors = survivors.join(
                            stored_hits, "doc_id", "left_anti"
                        )
                        append_to_text_minhash_index(
                            survivors,
                            index_root,
                            text_col=text_col,
                            mark_batch=(stream_id, batch_id),
                        )
                    finally:
                        stored_hits.unpersist()
                novel_rows = batch.join(
                    survivors.select("doc_id"), "doc_id", "left_semi"
                )
                # per-batch dirs + overwrite: a replay rewrites its
                # own output instead of appending a second copy
                novel_rows.write.mode("overwrite").parquet(
                    posixpath.join(novel_dir, f"batch_id={batch_id}")
                )
                dup.write.mode("overwrite").parquet(
                    posixpath.join(dup_dir, f"batch_id={batch_id}")
                )
            finally:
                losers.unpersist()
        finally:
            batch.unpersist()

    writer = (
        stream.writeStream.foreachBatch(_gate)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
