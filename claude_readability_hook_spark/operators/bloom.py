"""Bloom-filter seen-set gate: build a bit-set sketch over a key
column (crawl-frontier URLs, shard ids, benchmark n-grams) and probe a
candidate batch for membership — the constant-size alternative to
anti-joining a 100 TB catalog when false POSITIVES are acceptable
(a re-fetch skipped) and false negatives must be impossible (never
drop a truly-novel URL). Classic crawl-frontier machinery (Mercator,
Heritrix publish exactly this design).

Determinism contract: k hash functions are salted h32 (md5-derived,
engine-portable), bit positions are integer mod/div arithmetic, and
words pack 32 bits per BIGINT — 1<<63 overflows DuckDB's checked
left-shift, and sub-word packing costs nothing at these sizes, so the
whole sketch is exactly reproducible in the oracle.

Scale shape: the build is one narrow explode (k rows per key) and a
bit_or hash agg to at most m/32 rows; the sketch broadcasts to the
probe side (a 65k-bit filter is 8 KiB — even a 4-billion-bit filter
is 512 MiB, the regime where you shard the filter by key range). The
probe never shuffles the candidate batch: explode k positions, join
the broadcast word table, regroup on the already-colocated key."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import h32_expr

BLOOM_M_BITS = 65_536  # default filter width (power of two not required)
BLOOM_K = 4  # hash functions
_WORD = 32  # bits packed per BIGINT word (see module docstring)


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    return [
        h32_expr(F.concat(F.lit(f"bl{i}:"), key)) % m_bits for i in range(k)
    ]


def build_bloom(
    df: DataFrame,
    key_col: str = "url",
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """(word_idx, bits): the populated words of the filter — rows
    only for words with at least one set bit, so a sparse filter
    stays sparse on disk."""
    pos = df.select(
        F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias(
            "pos"
        )
    )
    return (
        pos.select(
            F.expr(f"pos div {_WORD}").cast("long").alias("word_idx"),
            F.expr(f"shiftleft(1L, cast(pos % {_WORD} as int))").alias("b"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("b").cast("long").alias("bits"))
    )


def probe_bloom(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str = "url",
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
    broadcast_filter: bool = True,
) -> DataFrame:
    """probes + (maybe_seen): true iff ALL k bits are set — no false
    negatives by construction; false-positive rate is the standard
    (1-e^{-kn/m})^k. m_bits/k must match the build call."""
    if broadcast_filter:
        bloom = F.broadcast(bloom)
    exploded = probes.select(
        F.col(key_col),
        F.posexplode(
            F.array(*_positions(F.col(key_col), m_bits, k))
        ).alias("i", "pos"),
    ).select(
        key_col,
        F.expr(f"pos div {_WORD}").cast("long").alias("word_idx"),
        F.expr(f"shiftleft(1L, cast(pos % {_WORD} as int))").alias("b"),
    )
    checked = exploded.join(bloom, "word_idx", "left").select(
        key_col,
        (F.coalesce(F.expr("bits & b"), F.lit(0)) != 0).alias("hit"),
    )
    verdict = checked.groupBy(key_col).agg(
        F.min("hit").alias("maybe_seen")
    )
    return probes.join(verdict, key_col, "left").select(
        *probes.columns,
        F.coalesce("maybe_seen", F.lit(False)).alias("maybe_seen"),
    )
