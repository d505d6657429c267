"""Benchmark n-gram decontamination (operators/decontam.py): planted
overlaps are flagged, clean docs are not, the benchmark side
broadcasts, and sub-n-token docs cannot contaminate."""

from __future__ import annotations

from pyspark.sql import functions as F


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_overlap_flagged_and_clean_docs_pass(spark):
    from claude_readability_hook_spark.operators.decontam import decontaminate

    bench = _df(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    docs = _df(
        spark,
        [
            # contains the benchmark 5-gram "quick brown fox jumps over"
            (1, "prefix words then THE QUICK brown fox Jumps over and more"),
            # same words, different order: no shared 5-gram
            (2, "fox brown quick the jumps lazy over dog the words"),
            # clean
            (3, "completely unrelated training document with enough tokens here"),
            # too short to hold any 5-gram
            (4, "tiny doc"),
        ],
    )
    out = {r["doc_id"]: r for r in decontaminate(docs, bench, n=5).collect()}
    assert len(out) == 4  # every doc gets a verdict row
    assert out[1]["contaminated"] and out[1]["n_hits"] >= 1
    assert not out[2]["contaminated"] and out[2]["n_hits"] == 0
    assert not out[3]["contaminated"]
    assert not out[4]["contaminated"] and out[4]["n_hits"] == 0


def test_hits_count_distinct_ngrams_and_normalization(spark):
    """Case/whitespace differences must not defeat the check (norm
    matches the dedup normalizer), and n_hits counts the doc's
    DISTINCT overlapping n-grams."""
    from claude_readability_hook_spark.operators.decontam import decontaminate

    bench = _df(spark, [(0, "a b c d e f")])  # 5-grams: "a b c d e", "b c d e f"
    docs = _df(
        spark,
        [(1, "A  b C d E f"), (2, "a b c d e x x x a b c d e")],
    )
    out = {r["doc_id"]: r for r in decontaminate(docs, bench, n=5).collect()}
    assert out[1]["n_hits"] == 2  # both benchmark 5-grams, despite case/ws
    assert out[2]["n_hits"] == 1  # repeated in doc but distinct-in-doc


def test_benchmark_side_broadcasts(spark):
    import contextlib
    import io

    from claude_readability_hook_spark.operators.decontam import decontaminate

    bench = _df(spark, [(0, "one two three four five six")])
    docs = _df(spark, [(1, "one two three four five six seven")])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        decontaminate(docs, bench, n=5).explain("formatted")
    assert "BroadcastHashJoin" in buf.getvalue()
