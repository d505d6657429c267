"""Per-source boilerplate n-grams: hand-computed detection thresholds
(df fraction, min-docs gate), positional coverage scores, the
broadcast regime knob, and the no-text-shuffle score plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from claude_readability_hook_spark.operators.boilerplate import (
    boilerplate_ngrams,
    boilerplate_scores,
)

TEMPLATE = "join our mailing list today"  # 5 tokens = exactly 1 shingle


def _corpus(spark):
    rows = [
        # s1: 4 docs, template in 2 of them (df 2/4 = exactly 50%)
        (1, "s1", TEMPLATE + " extra alpha"),
        (2, "s1", "prefix " + TEMPLATE),
        (3, "s1", "totally different words here nothing shared"),
        (4, "s1", "another unrelated document text goes here"),
        # s2: 4 docs, template in 3 (75%), plus one sub-n-token doc
        (5, "s2", TEMPLATE),
        (6, "s2", TEMPLATE),
        (7, "s2", TEMPLATE),
        (8, "s2", "tiny doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_detection_thresholds_hand_computed(spark):
    """Exactly the two source-templates clear the gate: s1's at the
    50% equality edge (df=2, n=4), s2's at 75% (df=3, n=4). Boundary
    shingles (template + per-doc neighbors) stay df=1."""
    bp = boilerplate_ngrams(_corpus(spark)).collect()
    got = {(r["source"], r["df_count"], r["n_docs"]) for r in bp}
    assert got == {("s1", 2, 4), ("s2", 3, 4)}
    # both rows carry the same shingle hash (same template text)
    assert len({r["sh_h"] for r in bp}) == 1


def test_min_docs_gate(spark):
    """min_docs above a source's size disables detection for it even
    at 100% document frequency."""
    bp = boilerplate_ngrams(_corpus(spark), min_docs=5).collect()
    assert bp == []


def test_positional_scores_hand_computed(spark):
    """doc 1: 3 shingle positions, 1 boilerplate → 1/3 half-up-micro
    = 0.333333; doc 2: 2 positions, 1 hit → 0.5; docs 3/4: clean;
    docs 5-7: the whole doc is template → 1.0; doc 8: <5 tokens →
    n_shingles=0, score 0.0 (still present in the output)."""
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_boiler"], r["boiler_score"])
        for r in boilerplate_scores(_corpus(spark)).collect()
    }
    assert got == {
        1: (3, 1, 0.333333),
        2: (2, 1, 0.5),
        3: (2, 0, 0.0),
        4: (2, 0, 0.0),
        5: (1, 1, 1.0),
        6: (1, 1, 1.0),
        7: (1, 1, 1.0),
        8: (0, 0, 0.0),
    }


def test_broadcast_knob_equal_results(spark):
    """Forced-shuffle and broadcast regimes agree row-for-row."""
    df = _corpus(spark)
    a = sorted(map(tuple, boilerplate_scores(df, broadcast_bp=True).collect()))
    b = sorted(map(tuple, boilerplate_scores(df, broadcast_bp=False).collect()))
    assert a == b


def test_score_plan_broadcasts_bp_and_never_shuffles_text(spark):
    """The scorer's only non-broadcast exchanges are keyed on doc_id
    (per-doc agg) — document text/shingles never shuffle; the
    boilerplate table arrives by BroadcastExchange. (The DETECTION
    side aggregates (source, sh_h) hash rows — narrow by design.)"""
    import contextlib
    import io
    import re

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "source", "text"
    )
    bp = boilerplate_ngrams(docs)
    plan_df = boilerplate_scores(docs, bp=bp, broadcast_bp=True)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastExchange" in plan
    for m in re.finditer(r"Exchange (\w+)\(?([^\n]*)", plan):
        kind, detail = m.group(1), m.group(2)
        if kind == "SinglePartition" or "broadcast" in detail.lower():
            continue
        assert "doc_id" in detail or "sh_h" in detail, (
            f"unexpected shuffle: {m.group(0)}"
        )
