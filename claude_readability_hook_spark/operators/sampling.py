"""Deterministic sampling operators for training-data pipelines.

No RNG anywhere: the sampling key is the 32-bit md5 prefix of the
doc_id (the same engine-portable h32 as the minhash family), so
splits are reproducible across runs, engines, and resumes — the
property a training/eval split must have. Both operators are pure
Column/window plans.

  train_val_split  per-doc split label from a hash threshold — a scan
                   free-rider, zero shuffle
  cap_per_source   keep the hash-smallest N docs per source (uniform
                   downsampling of over-represented sources). One
                   window shuffle keyed on source; a pathologically
                   dominant source is bounded by the same time-bucket
                   salting pattern as sessionize_salted if needed —
                   here the window carries (doc_id, source, hash) only,
                   never text, so the giant-key hazard is rows, not
                   bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import h32_expr


def train_val_split(
    df: DataFrame, val_fraction: float = 0.1, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, bucket, split): split='val' for the hash-lowest
    val_fraction of ids, else 'train'. Deterministic, stable under
    corpus growth (a doc never changes split)."""
    bucket = h32_expr(F.col(id_col).cast("string")) % 10_000
    return df.select(
        id_col,
        bucket.cast("long").alias("bucket"),
        F.when(bucket < int(val_fraction * 10_000), F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def source_weighted_sample(
    df: DataFrame, fraction_expr: "F.Column", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic per-row downsampling by a FRACTION that may vary
    per source/stratum (corpus reweighting — cap_per_source bounds
    counts, this scales proportions, e.g. downweight a boilerplate-
    heavy source to 20%). Keep iff h32(id) % 10000 < fraction·10000:
    RNG-free, stable under corpus growth, zero shuffle (a scan
    free-rider like train_val_split). fraction_expr is a Column in
    [0, 1] (a literal, or a CASE over the source column). The
    threshold is an explicit FLOOR — a bare cast('long') truncates in
    Spark while DuckDB's CAST(... AS BIGINT) rounds half-even, so any
    fraction whose *10000 product has fractional part ≥ 0.5 would
    silently diverge between engine and oracle (ADVICE r3); floor()
    means the same thing in every engine."""
    gate = (h32_expr(F.col(id_col).cast("string")) % 10_000) < F.floor(
        fraction_expr * 10_000
    ).cast("long")
    return df.filter(gate)


def cap_per_source(
    df: DataFrame, max_docs: int = 100, source_col: str = "source", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the hash-smallest max_docs per source — uniform,
    deterministic downsampling of over-represented sources (the
    anti-skew diet step before tokenization)."""
    w = Window.partitionBy(source_col).orderBy(
        h32_expr(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.select(id_col, source_col)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_docs)
        .select(id_col, source_col)
    )
