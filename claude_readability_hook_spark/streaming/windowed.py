"""Event-time windowed aggregation with watermarked late-data handling
— the Structured Streaming shape for continuous ingest metrics
(docs/minute per source, failure rates, byte volumes).

Semantics: tumbling event-time windows; rows later than the watermark
relative to the max seen event time are dropped from their (already
finalized) window; rows within the allowed lateness still update it.
State is bounded: a window's aggregate is evictable once the watermark
passes window.end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    stream: DataFrame,
    time_col: str = "ts",
    key_col: str = "source",
    window: str = "10 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """(window_start, window_end, key, n) tumbling counts with
    watermarked state eviction. Works identically on a batch frame
    (window() is a plain expression there) — the twin the test uses."""
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n",
        )
    )
