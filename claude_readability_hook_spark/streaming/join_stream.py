"""Stream-stream join: attach media features to media spans as BOTH
sides arrive — the continuous form of operators.multimodal.
join_media_features.

Spark's stream-stream inner join buffers both sides in state; the
watermarks plus the event-time range predicate bound that state (a
span can only match a feature row whose event time is within
`max_lag` of its own), so a crawl stream and a media-decode stream
can run indefinitely. Without the time bound the join would be
rejected for unbounded state — the range predicate IS the state
eviction policy (Spark docs' canonical join pattern).

Payloads never enter the join: the media side carries the already-
extracted FEATURE vector (decode ran scan-side on its stream), the
span side carries (doc_id, offset, media_ref, ts) only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_media_features_stream(
    spans: DataFrame,
    features: DataFrame,
    watermark: str = "10 minutes",
    max_lag: str = "15 minutes",
    span_time_col: str = "span_ts",
    feat_time_col: str = "feat_ts",
) -> DataFrame:
    """(doc_id, offset, media_ref, feature) for every media span whose
    feature row arrived within [span_ts − max_lag, span_ts + max_lag].
    Both inputs must be streaming frames carrying their event-time
    column; state is evicted once the watermark passes the range."""
    s = spans.withWatermark(span_time_col, watermark)
    f = features.withWatermark(feat_time_col, watermark)
    cond = (
        (s["media_ref"] == f["media_ref"])
        & (f[feat_time_col] >= s[span_time_col] - F.expr(f"INTERVAL {max_lag}"))
        & (f[feat_time_col] <= s[span_time_col] + F.expr(f"INTERVAL {max_lag}"))
    )
    return s.join(f, cond, "inner").select(
        s["doc_id"], s["offset"], s["media_ref"], f["feature"], s[span_time_col]
    )
