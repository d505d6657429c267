"""Streaming exact dedup: drop replayed/recrawled duplicates at ingest,
before extraction ever pays for them.

Two state regimes:

  bounded (the scale path)   dropDuplicatesWithinWatermark on the
                             content hash — state for a key is evictable
                             once the watermark passes its event time,
                             so a continuous crawl stream runs with
                             bounded state. Duplicates farther apart
                             than the watermark are caught downstream by
                             the batch resume anti-join (the committed-
                             output check), so correctness is layered,
                             not lost.
  unbounded                  plain dropDuplicates — exact across the
                             whole stream lifetime; state grows with
                             distinct keys (16-byte hash per doc). Only
                             for bounded replays/backfills.

The hash is md5 of the normalized, SEPARATOR-FRAMED flatten of the
span texts: spans join on a \\x1f unit separator (survives the
whitespace-collapsing normalization), so two documents whose span
texts merely split the same string at different offsets do NOT
collide — span boundaries are part of document identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.textcommon import norm_text_expr

_SEP = "\x1f"  # unit separator: not whitespace, survives normalization


def content_hash_expr() -> F.Column:
    """md5 over the normalized \\x1f-joined text-bearing spans."""
    flat = F.array_join(
        F.transform("spans", lambda s: F.coalesce(s["text"], F.lit(""))), _SEP
    )
    return F.md5(norm_text_expr(flat))


def stream_exact_dedup(
    stream: DataFrame,
    event_time_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Deduplicated stream keyed on the content hash.

    With event_time_col: watermarked, bounded-state (the production
    shape). Without: exact-unbounded (backfills only)."""
    hashed = stream.withColumn("dup_hash", content_hash_expr())
    if event_time_col is not None:
        return hashed.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
            ["dup_hash"]
        )
    return hashed.dropDuplicates(["dup_hash"])
