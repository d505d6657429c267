"""Corpus curation gate: the end-to-end keep/drop decision a
training-data pipeline runs after extraction — composition of the
individual operators (language ID, Gopher-style quality gate, exact
dedup), emitted as one auditable row per document.

Plan shape at 10^12 docs: language + quality are pure Column exprs in
the SAME projection as the scan (no joins between derived frames, no
re-reads); the dedup-loser check is the one shuffle and it moves
(doc_id, 16-byte hash) only — never text. The reason columns stay so
lineage can answer "why was this document dropped" without
recomputation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import exact_dup_losers
from .textstats import lang_pred_expr, quality_keep_expr


def curate(
    df: DataFrame,
    keep_langs: tuple[str, ...] = ("en",),
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, lang_pred, quality_keep, is_dup_loser, keep).

    keep = quality gate AND language gate AND not an exact-duplicate
    loser (the group keeper survives, so dedup never empties a group)."""
    text = F.col(text_col)
    gated = df.select(
        "doc_id",
        lang_pred_expr(text).alias("lang_pred"),
        quality_keep_expr(text).alias("quality_keep"),
    )
    losers = exact_dup_losers(df, text_col).withColumn("is_dup_loser", F.lit(True))
    return gated.join(losers, "doc_id", "left").select(
        "doc_id",
        "lang_pred",
        "quality_keep",
        F.coalesce(F.col("is_dup_loser"), F.lit(False)).alias("is_dup_loser"),
        (
            F.col("quality_keep")
            & F.col("lang_pred").isin(*keep_langs)
            & ~F.coalesce(F.col("is_dup_loser"), F.lit(False))
        ).alias("keep"),
    )
