"""Checkpoint-based resume: the anti-join that replaces the LRU cache.

The reference short-circuits on a 24h LRU cache hit
(lib/cache.ts:45-57, usecase.ts:41-46). In batch, "cached" ≡ already
committed to the output table, and resume = left_anti join of the
source against committed doc_ids (SURVEY §2.2 O5 / §2.3 J1). Commit
atomicity comes from the writer (sources/catalog.py); rerunning a
partially-failed job converges to the single-run output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def remaining_documents(
    src: DataFrame, done: DataFrame | None, broadcast_threshold: int = 50_000_000
) -> DataFrame:
    """src minus already-extracted doc_ids.

    The done-side is projected to doc_id only before the join so the
    anti-join ships one string column. Spark's AQE picks broadcast vs
    sort-merge from the actual size at runtime; we give it the hint
    when the done set is known-small (first resume of a mostly-failed
    run), otherwise leave the strategy to AQE — at 10^12 docs the done
    set is NOT broadcastable and must sort-merge on doc_id."""
    if done is None:
        return src
    done_ids = done.select("doc_id").distinct()
    return src.join(done_ids, on="doc_id", how="left_anti")


def cache_hits(src: DataFrame, done: DataFrame) -> DataFrame:
    """The complement — previously extracted rows (the 'cached=true'
    responses of the reference), for metrics parity."""
    return src.join(done.select("doc_id").distinct(), on="doc_id", how="left_semi").withColumn(
        "cached", F.lit(True)
    )
