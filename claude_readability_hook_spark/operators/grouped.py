"""Grouped-map operator (applyInPandas): per-group statistics that need
whole-group context — the API surface for custom grouped logic that
in-row array functions and plain aggregates can't express.

Demonstrator: per-source text-quality quantiles over the documents
table. At scale this shuffles one group per source key; skewed sources
would get the giant-key treatment (operators/skew.py)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
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


def per_source_stats(df: DataFrame) -> DataFrame:
    """documents(source, n_chars) → one stats row per source via
    groupBy().applyInPandas (whole group in one pandas frame)."""
    return df.select("source", "n_chars").groupBy("source").applyInPandas(
        _stats, schema=GROUP_STATS
    )
