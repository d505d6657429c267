"""Gopher duplicate-line gates (textstats.line_repetition): hand-built
documents with known line multisets, plus the no-shuffle plan claim."""

from __future__ import annotations

from claude_readability_hook_spark.operators.textstats import line_repetition


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in line_repetition(df).collect()}


def test_known_fractions(spark):
    out = _run(
        spark,
        [
            # 4 lines, 'ab' ×3 dup: dup_line 2/4, dup chars (3·2−2)/(6+4)
            (1, "ab\nab\nab\nwxyz"),
            (2, "unique one\nunique two"),  # no dups
            (3, ""),  # empty → zeros
            (4, "  \n \n"),  # whitespace-only lines drop out
            # trim unifies: ' x' == 'x ' after trim → 1 dup of 2
            (5, " x\nx "),
        ],
    )
    assert out[1]["n_lines"] == 4
    assert out[1]["dup_line_frac"] == 0.5
    assert out[1]["dup_char_frac"] == 0.4
    assert out[2]["dup_line_frac"] == 0.0
    assert out[2]["dup_char_frac"] == 0.0
    assert out[3]["n_lines"] == 0
    assert out[3]["dup_line_frac"] == 0.0
    assert out[4]["n_lines"] == 0
    assert out[5]["n_lines"] == 2
    assert out[5]["dup_line_frac"] == 0.5
    assert out[5]["dup_char_frac"] == 0.5


def test_in_row_plan_no_exchange(spark):
    df = spark.createDataFrame([(1, "a\nb")], "doc_id long, text string")
    plan = line_repetition(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure in-row: nothing shuffles
