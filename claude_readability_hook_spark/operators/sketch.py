"""Count-min sketch over a key stream — bounded-memory frequency
estimation, and the repo's HOT-KEY detector: the skew-salting pass
(operators/skew.py) needs to know which join/group keys are heavy
BEFORE it aggregates them, and at 10^12 rows an exact per-key count
is itself the aggregation you were trying to avoid. The sketch's
state is d×w integers regardless of key cardinality.

Why this is oracle-able when most sketches aren't: the CMS is a
DETERMINISTIC function of its inputs — cell (row, col) counts every
key whose seeded hash lands there, estimates are mins over d cells —
so DuckDB reproduces the exact sketch and the exact estimates from
the same md5-derived hash family (textcommon.seeded_md5_expr, the
minhash discipline). No RNG, no merge-order sensitivity (cell counts
are order-independent integer sums).

Plan shape at scale:
  BUILD: one explode + one groupBy (row, col) — the shuffle carries
  at most d×w rows per partition after map-side combine, CONSTANT in
  both corpus size and key cardinality (the point; a vocabulary agg
  is bounded by distinct keys, the sketch by d×w).
  PROBE: candidate keys join the d×w sketch (broadcast — a few KB)
  and take min over their d cells; estimate ≥ true count always
  (CMS one-sided error), with overestimates bounded by the usual
  e/w per-row collision mass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import h32_expr
from .textcommon import seeded_md5_expr

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _cms_col_expr(key: F.Column, row: int, width: int) -> F.Column:
    """Column index of `key` in sketch row `row`: first 8 hex chars of
    the seeded md5 as int64, mod width — the h32 family keyed like the
    minhash seeds. DuckDB twin mirrors digit-by-digit."""
    h = F.conv(F.substring(seeded_md5_expr(row, key), 1, 8), 16, 10).cast("long")
    return (h % width).cast("int")


def cms_build(
    keyed: DataFrame,
    key_col: str = "key",
    weight_col: str | None = None,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """The sketch table (row, col, cnt): d hash rows per input key,
    one bounded groupBy. `weight_col` aggregates pre-counted keys
    (e.g. a (key, n) table) instead of raw occurrences."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    cells = keyed.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cms_col_expr(F.col(key_col), r, width).alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell"),
        w.alias("w"),
    )
    return (
        cells.select("cell.row", "cell.col", "w")
        .groupBy("row", "col")
        .agg(F.sum("w").cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    key_col: str = "key",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(key, est) for every candidate key: min over its d cells.
    The sketch broadcasts (≤ d×w rows); absent cells count 0 (a key
    the stream never hashed there)."""
    probes = candidates.select(
        F.col(key_col).alias("key"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cms_col_expr(F.col(key_col), r, width).alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell"),
    ).select("key", "cell.row", "cell.col")
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est"))
    )


def cms_hot_keys(
    keyed: DataFrame,
    key_col: str = "key",
    threshold: int = 100,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    candidates: DataFrame | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """Keys whose CMS estimate clears `threshold` — the hot-key
    candidate set the skew-salting pass consumes
    (operators/skew.hot_key_salted_repartition and
    operators/sessions.sessionize_auto probe this). One-sided: every
    truly-hot key survives (est ≥ true count); collision-inflated
    cold keys may ride along and cost only an unnecessary salt.

    `candidates` is the SCALE path: pass a bounded candidate set (a
    stored row sample, last batch's hot set, a domain whitelist) and
    the probe never touches key cardinality. The convenience default
    distincts the input keys — bounded by key cardinality, which is
    exactly what the sketch's build side avoids; fine when distinct
    keys are vocabulary-sized, wrong when keys are near-unique.

    `weight_col` marks `keyed` as an already-counted (key, weight)
    table: the sketch adds the weights (cell sums identical to
    feeding raw occurrences) but pays depth hashes per DISTINCT key
    instead of per occurrence — aggregate before you hash."""
    sketch = cms_build(keyed, key_col, weight_col=weight_col, depth=depth, width=width)
    cands = (
        candidates.select(F.col(key_col).alias("key")).distinct()
        if candidates is not None
        else keyed.select(F.col(key_col).alias("key")).distinct()
    )
    return cms_estimate(sketch, cands, "key", depth, width).filter(
        F.col("est") >= threshold
    )


# ---------------------------------------------------------------------------
# HyperLogLog distinct-cardinality sketch (Flajolet et al. 2007): the
# fixed-size estimator for "how many distinct tokens/URLs/shingles does
# this 100 TB corpus hold" — the question approx_count_distinct answers
# inside Spark, reimplemented here with ENGINE-PORTABLE arithmetic so
# the DuckDB oracle reproduces the estimate bit-for-bit:
#   - h32 (md5-derived) hashes, bucket = h mod m, 26-bit rank window;
#   - rho via length(bin(rest)) — bin() exists in both engines and
#     never pads leading zeros;
#   - the harmonic sum Σ 2^{-M_j} is a sum of dyadic rationals with
#     exponents ≥ -27 over ≤ m terms, so every partial sum is EXACT in
#     a double (needs < 53 mantissa bits) and the result is
#     order-independent — no accumulation-order hazard;
#   - alpha_m * m² / S is two exactly-rounded IEEE ops on identical
#     inputs — identical bits in both engines.
# No small/large-range corrections (they need ln — the libm-free rule);
# the raw estimator's bias at n >> m is the documented tradeoff, and
# the registers travel with the estimate so a consumer can apply any
# correction downstream.
# ---------------------------------------------------------------------------

HLL_M = 64  # registers (p = 6)
HLL_ALPHA = 0.709  # standard alpha_64 constant


def hll_registers(
    df: DataFrame, key_col: str, m: int = HLL_M
) -> DataFrame:
    """(bucket, register) for ALL m buckets (empties carry 0) — the
    mergeable sketch state: max-combine two register tables to union
    their sketches (used by snapshot-incremental cardinality)."""
    spark = df.sparkSession
    h = h32_expr(F.col(key_col))
    rest = F.expr(f"h div {m}")
    observed = (
        df.select((h % m).cast("long").alias("bucket"), h.alias("h"))
        .select(
            "bucket",
            F.when(rest == 0, F.lit(27))
            .otherwise(F.lit(27) - F.length(F.bin(rest)))
            .cast("long")
            .alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("register"))
    )
    full = spark.range(m).select(F.col("id").cast("long").alias("bucket"))
    return full.join(observed, "bucket", "left").select(
        "bucket",
        F.coalesce("register", F.lit(0)).cast("long").alias("register"),
    )


def hll_estimate(registers: DataFrame, m: int = HLL_M) -> DataFrame:
    """One row (m, nonzero_registers, estimate): the raw HLL estimate
    alpha_m · m² / Σ 2^{-M_j}, 6dp."""
    return registers.agg(
        F.lit(m).cast("long").alias("m"),
        F.sum((F.col("register") > 0).cast("long"))
        .cast("long")
        .alias("nonzero_registers"),
        F.round(
            F.lit(HLL_ALPHA)
            * F.lit(float(m * m))
            / F.sum(
                F.expr(
                    "cast(1.0 as double)"
                    " / cast(shiftleft(1L, cast(register as int)) as double)"
                )
            ),
            6,
        ).alias("estimate"),
    )


def hll_distinct(df: DataFrame, key_col: str, m: int = HLL_M) -> DataFrame:
    """(m, nonzero_registers, estimate, exact_distinct): sketch
    estimate next to the exact answer — the eval harness shape (at
    production scale you emit only the sketch; exact is the test
    oracle's privilege)."""
    est = hll_estimate(hll_registers(df, key_col, m), m)
    exact = df.agg(
        F.countDistinct(key_col).cast("long").alias("exact_distinct")
    )
    return est.crossJoin(exact)
