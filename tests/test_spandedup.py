"""Duplicated-span removal (operators/spandedup.py): planted repeated
segments are scrubbed from every doc, unique text survives, order is
preserved, and text never shuffles (broadcast joins only)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BOILER = "b0 b1 b2 b3 b4 b5 b6 b7 b8 b9"  # exactly one 10-token segment


def test_repeated_segment_scrubbed_everywhere(spark):
    from claude_readability_hook_spark.operators.spandedup import (
        remove_duplicated_spans,
    )
    import hashlib

    docs = _df(
        spark,
        [
            (1, BOILER + " u1a u1b u1c u1d u1e u1f u1g u1h u1i u1j"),
            (2, BOILER + " u2a u2b u2c u2d u2e u2f u2g u2h u2i u2j"),
            (3, BOILER),
            (4, "only unique tokens here nothing shared with others at all"),
        ],
    )
    out = {r["doc_id"]: r for r in remove_duplicated_spans(docs, min_docs=2).collect()}
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    # the shared leading segment is dropped; the unique tail survives
    assert out[1]["n_segs"] == 2 and out[1]["n_dropped"] == 1
    assert out[1]["clean_md5"] == md5("u1a u1b u1c u1d u1e u1f u1g u1h u1i u1j")
    assert out[2]["clean_md5"] == md5("u2a u2b u2c u2d u2e u2f u2g u2h u2i u2j")
    # a doc that WAS only boilerplate scrubs to empty
    assert out[3]["clean_md5"] == md5("") and out[3]["n_dropped"] == 1
    # unique docs untouched (10-token doc = 1 segment, kept)
    assert out[4]["n_dropped"] == 0
    assert out[4]["clean_md5"] == md5(
        "only unique tokens here nothing shared with others at all"
    )


def test_order_preserved_and_partial_trailing_segment(spark):
    from claude_readability_hook_spark.operators.spandedup import (
        remove_duplicated_spans,
        segments_expr,
    )
    import hashlib

    # 25 tokens → segments of 10/10/5; the MIDDLE segment is shared
    mid = "m0 m1 m2 m3 m4 m5 m6 m7 m8 m9"
    docs = _df(
        spark,
        [
            (1, "a0 a1 a2 a3 a4 a5 a6 a7 a8 a9 " + mid + " t0 t1 t2 t3 t4"),
            (2, "c0 c1 c2 c3 c4 c5 c6 c7 c8 c9 " + mid + " s0 s1 s2 s3 s4"),
        ],
    )
    segs = docs.select(segments_expr(F.col("text")).alias("s")).collect()
    assert all(len(r["s"]) == 3 for r in segs)
    out = {r["doc_id"]: r for r in remove_duplicated_spans(docs, min_docs=2).collect()}
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert out[1]["n_segs"] == 3 and out[1]["n_dropped"] == 1
    # first and trailing-partial segments survive, in order
    assert out[1]["clean_md5"] == md5("a0 a1 a2 a3 a4 a5 a6 a7 a8 a9 t0 t1 t2 t3 t4")
    assert out[2]["clean_md5"] == md5("c0 c1 c2 c3 c4 c5 c6 c7 c8 c9 s0 s1 s2 s3 s4")


def test_text_never_shuffles(spark):
    """Both joins in the plan must be broadcast — the docs-side text
    column stays on its scan partitions end to end."""
    import contextlib
    import io

    from claude_readability_hook_spark.operators.spandedup import (
        remove_duplicated_spans,
    )

    docs = _df(spark, [(1, BOILER), (2, BOILER)])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        remove_duplicated_spans(docs, min_docs=2).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
