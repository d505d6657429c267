"""Streaming frontier gate: continuous URL discovery → stored
seen-set anti-join → URL quality gate → novel-only emission, one
micro-batch at a time — the crawl front-door as a stream (batch twin:
jobs/frontier_job.py; the reference serves single URLs and never
plans a crawl, apps/gateway/src/features/extract).

Per micro-batch (foreachBatch + the batch operators):

  1. in-batch dedup by url, keeping the MAX priority (a URL discovered
     twice in one batch — seed list ∩ sitemap — is one fetch);
  2. probe the STORED seen-set: parquet partitioned by
     bucket = h32(url) % SEEN_BUCKETS under per-batch subdirs
     (seen/batch_id=N/bucket=B). The probe filters to the batch's OWN
     bucket values (≤ SEEN_BUCKETS literals, driver-collected like
     the knn probe-key DPP workaround), so a batch touching few
     buckets prunes most of the store;
  3. RefinedWeb URL quality gate (frontier.url_quality) on the unseen
     remainder — rejected rows land with their feature columns;
  4. emit scheduled/batch_id=N (url, priority — ready for
     schedule_frontier) and append the batch's novel urls to the
     seen-set.

Idempotence under foreachBatch's at-least-once replay — the
image_stream/text_stream discipline: every sink AND the seen-set
append are per-batch directories written with overwrite, so a
replayed batch rewrites its own output byte-for-byte instead of
double-appending; the replayed probe excludes the batch's own
seen/batch_id=N partition from the store read, so the split it
recomputes matches the original run exactly.

Scale shape: URLs are narrow rows; the only joins are the in-batch
groupBy(url) and the bucket-pruned left_anti against the store —
nothing wide, no page bytes, and the seen-set layout is append-only
(compaction = rewrite into a fresh root, same as the shard export
contract).
"""

from __future__ import annotations

import posixpath

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import h32_expr
from ..operators.frontier import url_quality

SEEN_BUCKETS = 64


def gate_frontier_stream(
    stream: DataFrame,
    seen_root: str,
    scheduled_dir: str,
    rejected_dir: str,
    checkpoint_dir: str,
    n_buckets: int = SEEN_BUCKETS,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Start the gate: `stream` carries (url, priority) discovery
    rows; novel quality-passing URLs land under
    scheduled_dir/batch_id=N, quality rejects under
    rejected_dir/batch_id=N with their feature rows, and the seen-set
    at seen_root grows by exactly this batch's novel urls (replays
    overwrite their own partitions and re-derive the same split)."""

    def _gate(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        fresh = (
            batch.groupBy("url")
            .agg(F.max("priority").alias("priority"))
            .withColumn("bucket", (h32_expr(F.col("url")) % n_buckets).cast("int"))
        )
        fresh.persist()
        try:
            buckets = [r["bucket"] for r in fresh.select("bucket").distinct().collect()]
            try:
                store = (
                    spark.read.parquet(seen_root)
                    # a replay must not see its own first attempt's rows
                    .filter(F.col("batch_id") != batch_id)
                    .filter(F.col("bucket").isin(buckets))
                    .select("url")
                )
                unseen = fresh.join(store, "url", "left_anti")
            except AnalysisException:
                # first batch: no store yet
                unseen = fresh
            unseen.persist()
            try:
                feats = url_quality(unseen.select("url"))
                rejected = feats.filter(~F.col("keep"))
                scheduled = unseen.join(
                    feats.filter(F.col("keep")).select("url"), "url", "left_semi"
                )
                rejected.write.mode("overwrite").parquet(
                    posixpath.join(rejected_dir, f"batch_id={batch_id}")
                )
                scheduled.select("url", "priority").write.mode("overwrite").parquet(
                    posixpath.join(scheduled_dir, f"batch_id={batch_id}")
                )
                # the seen-set records EVERY unseen url (rejects too:
                # a recrawl of a spam URL should not re-run the gate)
                unseen.select("url", "bucket").write.mode("overwrite").partitionBy(
                    "bucket"
                ).parquet(posixpath.join(seen_root, f"batch_id={batch_id}"))
            finally:
                unseen.unpersist()
        finally:
            fresh.unpersist()

    writer = (
        stream.writeStream.foreachBatch(_gate)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
