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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textcommon import norm_text_expr
from .textstats import lang_pred_expr, quality_keep_expr


def curate(
    df: DataFrame,
    keep_langs: tuple[str, ...] = ("en",),
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, lang_pred, quality_keep, is_dup_loser, keep).

    keep = quality gate AND language gate AND not an exact-duplicate
    loser (the group keeper survives, so dedup never empties a group).

    ONE corpus scan: language, quality and the dedup hash ride the
    same projection, and the loser flag is the dup_hash window rank
    computed in place (rank ≥ 2 ⟺ exact_dup_losers membership). The
    former two-frame join read the corpus twice and broadcast the
    loser set — a corpus-sized broadcast hazard on a duplicate-heavy
    crawl; here the one exchange carries only (doc_id, lang, flag,
    16-byte hash) rows."""
    text = F.col(text_col)
    base = df.select(
        "doc_id",
        lang_pred_expr(text).alias("lang_pred"),
        quality_keep_expr(text).alias("quality_keep"),
        F.md5(norm_text_expr(text)).alias("dup_hash"),
    )
    w = Window.partitionBy("dup_hash").orderBy("doc_id")
    is_loser = F.row_number().over(w) >= 2
    return base.withColumn("is_dup_loser", is_loser).select(
        "doc_id",
        "lang_pred",
        "quality_keep",
        "is_dup_loser",
        (
            F.col("quality_keep")
            & F.col("lang_pred").isin(*keep_langs)
            & ~F.col("is_dup_loser")
        ).alias("keep"),
    )
