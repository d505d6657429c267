"""Shared text primitives for the dedup / similarity / stats operators.

Every expression here has an exact DuckDB-SQL twin (documented inline)
— the driver's DuckDB oracle compares value hashes, so tokenization,
hashing and shingling must agree bit-for-bit across engines. md5 is
the cross-engine hash (identical lowercase-hex output in Spark and
DuckDB); xxhash64 is Spark-only and used only where no oracle applies.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens_expr(text: Column) -> Column:
    """Whitespace tokens, empties dropped (Python str.split semantics).

    DuckDB twin: list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')

    array_remove(split, '') — not a higher-order filter(): the lambda
    form is CodegenFallback (interpreted per element, r9 finding);
    array_remove is a plain specialized expression with identical
    semantics (split never yields nulls, so only '' elements drop).
    """
    return F.array_remove(F.split(text, r"\s+"), "")


def norm_text_expr(text: Column) -> Column:
    """Dedup normalization: lowercase + collapse whitespace + trim.

    DuckDB twin: trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
    """
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def shingles_expr(tokens: Column, n: int = 3) -> Column:
    """Distinct word n-grams joined by single spaces; docs with fewer
    than n tokens yield an empty set (they opt out of near-dup checks).

    DuckDB twin (1-based inclusive slices):
      list_distinct(list_transform(
        range(1, greatest(len(tokens) - {n-1}, 0) + 1),
        i -> array_to_string(tokens[i:i+{n-1}], ' ')))
    """
    # Two subtleties:
    #  - Spark's sequence(1, 0) generates a DESCENDING [1, 0] instead of
    #    an empty array, so short docs need the explicit guard.
    #  - Catalyst's CollapseProject would inline the `tokens` expression
    #    into the per-index lambda, re-splitting the text once per
    #    shingle (O(tokens²) per doc — measured 8× slowdown). Binding
    #    tokens as a lambda variable via the array+transform let-trick
    #    forces single evaluation regardless of projection collapse.
    def make(toks: Column) -> Column:
        return F.when(
            F.size(toks) >= n,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                    lambda i: F.concat_ws(
                        " ", *[F.element_at(toks, i + k) for k in range(n)]
                    ),
                )
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.flatten(F.transform(F.array(tokens), make))


def seeded_md5_expr(seed: Column | int, value: Column) -> Column:
    """md5('<seed>|<value>') — the cross-engine seeded hash family used
    for minhash. DuckDB twin: md5(seed::varchar || '|' || value)."""
    seed_col = F.lit(str(seed)) if isinstance(seed, int) else seed.cast("string")
    return F.md5(F.concat(seed_col, F.lit("|"), value))


DUCKDB_TOKENS = "list_filter(regexp_split_to_array({col}, '\\s+'), t -> t <> '')"
DUCKDB_NORM = "trim(regexp_replace(lower({col}), '\\s+', ' ', 'g'))"
