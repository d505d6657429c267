"""Replicates the driver's DuckDB-oracle compare locally at sf0.001:
row count + column names + order-insensitive value equality for every
queries()/oracle_sql() pair. Keeping this green keeps
CORRECTNESS_r{N}.json green by construction."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck_rows(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _norm_value(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "as_tuple"):  # Decimal
        return round(float(v), 6)
    return v


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(cols), sorted(
        tuple(_norm_value(r[i]) for i in order) for r in rows
    )


def _pairs():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    return [(name, qs[name], sql) for name, sql in oracles.items()]


@pytest.mark.parametrize("name,query,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_oracle_parity(spark, name, query, sql):
    sdf = query(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    duck_cols, duck_rows = _duck_rows(sql)

    s_cols, s_vals = _normalize(spark_cols, spark_rows)
    d_cols, d_vals = _normalize(duck_cols, duck_rows)

    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_vals) == len(d_vals), (
        f"{name}: row count {len(s_vals)} vs {len(d_vals)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_vals, d_vals) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


# The driver gate compares at sf0.01; rerun the float-sensitive /
# case-analysis-heavy queries there too (different doc texts exercise
# different corpus cases and accumulation patterns).
SF01_CRITICAL = [
    "extract_flagship",
    "dedup_minhash_lsh",
    "ivf_assign",
    "ivf_ann_topk",
    "embed_quantize",
    "curate",
    "per_source_stats",
]


@pytest.mark.parametrize("name", SF01_CRITICAL)
def test_oracle_parity_sf001(spark, name):
    sdf = entrymod.queries()[name](spark, "/root/testdata/sf0.01")
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    for t in TABLES:
        path = f"/root/testdata/sf0.01/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    cur = con.execute(entrymod.oracle_sql()[name])
    duck_cols = [d[0] for d in cur.description]
    duck_rows = cur.fetchall()

    s_cols, s_vals = _normalize(sdf.columns, spark_rows)
    d_cols, d_vals = _normalize(duck_cols, duck_rows)
    assert s_cols == d_cols
    assert len(s_vals) == len(d_vals)
    mismatches = [(a, b) for a, b in zip(s_vals, d_vals) if a != b]
    assert not mismatches, f"{name}@sf0.01: first mismatches {mismatches[:3]}"


def test_all_query_names_have_oracle_or_are_declared_rows_only():
    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    rows_only = qs - oracles
    # every query has a hard oracle — extract_flagship gained an
    # arithmetic twin in round 2 (the corpus is doc_id-deterministic)
    assert rows_only == set(), rows_only


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"doc_id", "title", "engine", "score", "success"} <= set(df.columns)
