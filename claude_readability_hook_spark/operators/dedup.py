"""Deduplication operators for training-data pipelines.

Four tiers, each with a different cost/recall point at 100 TB:

  exact_duplicates      one shuffle on a 16-byte hash — always run first
  minhash_lsh           shingle → minhash signature → banded bucket join;
                        candidate pairs without the n² cross-join
  simhash               per-doc 16-bit signature; near-dups share values
                        (or differ by 1-2 bits); one narrow shuffle
  ngram_jaccard_pairs   exact Jaccard on shingle sets via shingle-key
                        self-join — the verifier for LSH candidates

Scale notes (the design point is 10^12 docs):
  - every operator keys its shuffle on a short hash/shingle, never on
    raw text; signatures are computed in-row with array expressions
    (whole-stage codegen, zero Python)
  - minhash banding keeps the self-join key space sparse: expected
    bucket size is O(1) for non-duplicates, so the join output is
    ~linear in the number of true near-dup pairs
  - the jaccard verifier joins on exploded shingles and would blow up
    on boilerplate shingles; the hot-shingle cap (drop shingles shared
    by > max_shingle_df docs) bounds worst-case fanout — the same
    trick as salting a skewed join key
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textcommon import norm_text_expr, seeded_md5_expr, shingles_expr, tokens_expr


def exact_duplicates(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup on normalized text. Returns one row per duplicate
    GROUP: (dup_hash, n_docs, keeper_doc_id) with n_docs >= 2.

    DuckDB oracle: md5 over the same normalization, HAVING count(*)>1.
    """
    return (
        df.select(
            F.col("doc_id"), F.md5(norm_text_expr(F.col(text_col))).alias("dup_hash")
        )
        .groupBy("dup_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def doc_shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, shingles array<string>) — shared by the near-dup family."""
    return df.select(
        "doc_id", shingles_expr(tokens_expr(F.col(text_col)), n).alias("shingles")
    )


def minhash_signature(
    df: DataFrame, num_hashes: int = 12, text_col: str = "text", n: int = 3
) -> DataFrame:
    """In-row minhash signature: sig[i] = min(md5(i || '|' || shingle)).

    Lexicographic min over hex strings is a valid minhash (uniform hash
    family indexed by seed) and is reproducible in any engine with md5
    — no Python, no UDF, no shuffle."""
    shingled = doc_shingles(df, text_col, n)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(F.col("shingles"), lambda s: seeded_md5_expr(i, s))
        ),
    )
    return shingled.filter(F.size("shingles") > 0).select(
        "doc_id", sig.alias("signature")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    num_hashes: int = 12,
    band_size: int = 3,
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs (doc_a < doc_b) sharing >= 1 LSH band.

    Plan shape: in-row signature → posexplode bands (num_hashes/band_size
    rows per doc, ~30 bytes each) → shuffle on (band_idx, band_key) →
    self-join within buckets → distinct pairs. The shuffled payload is
    signatures, not documents — at 10^12 docs this is the only join
    that still fits."""
    nbands = num_hashes // band_size
    sig = minhash_signature(df, num_hashes, text_col, n)
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(nbands - 1)),
                lambda b: F.md5(
                    F.concat_ws("|", F.slice(F.col("signature"), b * band_size + 1, band_size))
                ),
            )
        ).alias("band_idx", "band_key"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def simhash(df: DataFrame, bits: int = 16, text_col: str = "text") -> DataFrame:
    """Per-doc simhash over whitespace tokens.

    Token bit b comes from the b-th bit of the md5 hex digest (hex char
    b//4, bit 3-(b%4) of its value — arithmetic only, so the identical
    formula runs in DuckDB). Signature bit b is the sign of the ±1 vote
    sum. Computed fully in-row; one narrow projection, no shuffle."""
    tokens = tokens_expr(F.col(text_col))

    def hex_val(tok, b):  # value of hex char b//4 of md5(tok)
        c = F.substring(F.md5(tok), b // 4 + 1, 1)
        return F.instr(F.lit("0123456789abcdef"), c) - 1

    def bit(tok, b):  # bit (3 - b%4) of that value, MSB-first within the char
        shift = 3 - (b % 4)
        return F.floor(hex_val(tok, b) / F.lit(2**shift)).cast("long") % 2

    def bit_vote(b):  # Σ over tokens of (bit ? +1 : -1)
        return F.aggregate(
            tokens,
            F.lit(0).cast("long"),
            lambda acc, tok: acc + F.when(bit(tok, b) == 1, 1).otherwise(-1),
        )

    sig = None
    for b in range(bits):
        term = F.when(bit_vote(b) > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term

    return df.select("doc_id", sig.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
    max_shingle_df: int = 100,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing ≥1 shingle.

    (doc_a, doc_b, jaccard) with jaccard rounded to 6dp and ≥ threshold.
    The max_shingle_df cap drops boilerplate shingles before the
    self-join — fanout control, same role as skew-salting."""
    shingled = doc_shingles(df, text_col, n).filter(F.size("shingles") > 0)
    sizes = shingled.select("doc_id", F.size("shingles").alias("n_shingles"))
    exploded = shingled.select("doc_id", F.explode("shingles").alias("shingle"))

    hot = (
        exploded.groupBy("shingle")
        .agg(F.count("*").alias("df_count"))
        .filter(F.col("df_count") > max_shingle_df)
        .select("shingle")
    )
    pruned = exploded.join(hot, "shingle", "left_anti")

    a = pruned.alias("a")
    b = pruned.alias("b")
    shared = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("shared"))
    )
    return (
        shared.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_shingles", "size_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_shingles", "size_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("shared") / (F.col("size_a") + F.col("size_b") - F.col("shared")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
