"""Benchmark decontamination: flag training documents sharing any word
n-gram with an evaluation/benchmark set (the standard 13-gram-overlap
style check — GPT-3 appendix C / Gopher section A.3 describe the
public method; n is a parameter here).

Why it's a first-class pipeline stage: at pre-training scale the
training corpus must be scrubbed of benchmark text or downstream evals
are meaningless. The check is asymmetric — the benchmark side is TINY
(thousands of documents) while the corpus side is the full crawl — so
the scale shape is:

  1. benchmark n-grams: exploded + distinct once, a small table
     (≤ a few million short strings) → BROADCAST
  2. corpus n-grams: computed IN-ROW per document (shingles_expr:
     one O(tokens) pass, distinct within doc) and exploded — the only
     wide operation, and it carries (doc_id, ngram) pairs only, never
     document text
  3. broadcast inner join + groupBy(doc_id) count — map-side partial
     aggregation collapses hits before the shuffle, which carries
     (doc_id, long)
  4. left join back onto the doc-id spine for the clean rows
     (n_hits = 0)

Tokenization/normalization reuses the dedup primitives
(textcommon.norm_text_expr / tokens_expr / shingles_expr), so the
DuckDB oracle twins bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textcommon import norm_text_expr, shingles_expr, tokens_expr

DECONTAM_NGRAM = 5


def _doc_ngrams(df: DataFrame, n: int, text_col: str) -> DataFrame:
    """(doc_id, ngram) — per-doc DISTINCT word n-grams, computed in-row
    then exploded (docs shorter than n tokens contribute nothing)."""
    grams = shingles_expr(tokens_expr(norm_text_expr(F.col(text_col))), n)
    return df.select("doc_id", F.explode(grams).alias("ngram"))


def benchmark_ngrams(bench: DataFrame, n: int = DECONTAM_NGRAM, text_col: str = "text") -> DataFrame:
    """The contamination blocklist: distinct word n-grams of the
    benchmark set. Small by construction — benchmarks are thousands of
    documents, so this broadcasts."""
    return _doc_ngrams(bench, n, text_col).select("ngram").distinct()


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = DECONTAM_NGRAM,
    text_col: str = "text",
    broadcast_hits: bool = True,
) -> DataFrame:
    """(doc_id, n_hits, contaminated) for every corpus document:
    n_hits = how many of the doc's distinct n-grams appear in the
    benchmark set; contaminated = any hit. Keep/drop policy is the
    caller's (typically drop or line-level scrub contaminated docs
    before tokenization). The hit table has one row per CONTAMINATED
    doc — normally tiny (benchmark overlap is the exception, not the
    rule), hence broadcast onto the narrow doc-id spine by default;
    a pathologically contaminated corpus sets broadcast_hits=False
    and the spine join shuffles (doc_id, long) pairs only — document
    text is never in either join."""
    hits = (
        _doc_ngrams(docs, n, text_col)
        .join(F.broadcast(benchmark_ngrams(bench, n, text_col)), "ngram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    hits_side = F.broadcast(hits) if broadcast_hits else hits
    return (
        docs.select("doc_id")
        .join(hits_side, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )
