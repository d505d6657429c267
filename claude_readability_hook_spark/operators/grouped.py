"""Per-group statistics (quantiles) — two implementations with the
same exact output:

  per_source_stats        the SCALE path (default): value-histogram
                          aggregation. Shuffled state is one row per
                          DISTINCT (source, n_chars) value — bounded by
                          value cardinality, never by document count —
                          then exact linear-interpolation quantiles are
                          read off the cumulative histogram with window
                          + conditional-min aggregates. All codegen'd
                          Catalyst operators; no Python, no whole-group
                          materialization, no OOM on a dominant source.
  per_source_stats_exact  the applyInPandas twin: whole group in one
                          pandas frame. Kept as (a) the grouped-map API
                          demonstrator and (b) the differential oracle
                          for the scale path — tests assert bit-equal
                          output. NOT for production: a dominant source
                          at web scale is a single-task OOM.

Both match DuckDB's quantile_cont (linear interpolation, the pandas
default) exactly, so either hash-matches the driver oracle.

For metrics with unbounded value cardinality (where the histogram
itself would blow up) use percentile_approx instead and accept the
sketch error; n_chars-style bounded-domain stats don't need to.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

GROUP_STATS = StructType(
    [
        StructField("source", StringType(), False),
        StructField("n_docs", LongType(), False),
        StructField("chars_p50", DoubleType(), False),
        StructField("chars_p90", DoubleType(), False),
        StructField("chars_max", LongType(), False),
    ]
)


def _quantile_cont_agg(q: float):
    """Exact linear-interpolation quantile over a cumulative histogram
    grouped by source: h = (n−1)·q sits between the values at 0-based
    ranks ⌊h⌋ and ⌈h⌉; value-at-rank-k = min value whose inclusive
    cumulative count exceeds k. n_docs is a grouping column, so h is
    constant within the group and the rank probes are plain
    conditional mins — partial-aggregatable, codegen'd."""
    h = (F.col("n_docs") - 1) * F.lit(q)
    vl = F.min(F.when(F.col("cum") > F.floor(h), F.col("n_chars")))
    vu = F.min(F.when(F.col("cum") > F.ceil(h), F.col("n_chars")))
    return F.round(vl + (h - F.floor(h)) * (vu - vl), 6)


def per_source_stats(df: DataFrame) -> DataFrame:
    """documents(source, n_chars) → (source, n_docs, chars_p50,
    chars_p90, chars_max), exact, via the histogram plan:

      groupBy(source, n_chars).count()      # map-side combine; shuffle
                                            # is one row per distinct value
      window cumsum over value order        # same source partitioning
      groupBy(source).conditional-min       # rank probes → quantiles
    """
    hist = (
        df.select("source", "n_chars")
        .groupBy("source", "n_chars")
        .agg(F.count("*").alias("cnt"))
    )
    w = (
        Window.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    totals = hist.groupBy("source").agg(
        F.sum("cnt").alias("n_docs"), F.max("n_chars").alias("chars_max")
    )
    return (
        cum.join(totals, "source")
        .groupBy("source", "n_docs", "chars_max")
        .agg(
            _quantile_cont_agg(0.5).alias("chars_p50"),
            _quantile_cont_agg(0.9).alias("chars_p90"),
        )
        .select("source", "n_docs", "chars_p50", "chars_p90", "chars_max")
    )


def _stats(pdf: pd.DataFrame) -> pd.DataFrame:
    chars = pdf["n_chars"]
    return pd.DataFrame(
        [
            {
                "source": pdf["source"].iloc[0],
                "n_docs": len(pdf),
                # linear interpolation == DuckDB quantile_cont — exact twin
                "chars_p50": round(float(chars.quantile(0.5, interpolation="linear")), 6),
                "chars_p90": round(float(chars.quantile(0.9, interpolation="linear")), 6),
                "chars_max": int(chars.max()),
            }
        ]
    )


def per_source_stats_exact(df: DataFrame) -> DataFrame:
    """groupBy().applyInPandas twin (whole group in one pandas frame) —
    the grouped-map API surface and the differential check for
    per_source_stats. Small-scale only."""
    return df.select("source", "n_chars").groupBy("source").applyInPandas(
        _stats, schema=GROUP_STATS
    )
