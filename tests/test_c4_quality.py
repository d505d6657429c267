"""C4 cleaning rules (textstats.c4_quality): hand-built pages tripping
each published rule, the cleaned-text hash, and the no-shuffle plan."""

from __future__ import annotations

import hashlib

from claude_readability_hook_spark.operators.textstats import c4_quality

GOOD = "\n".join(["the quick brown fox jumps over the dog."] * 4)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in c4_quality(df, **kw).collect()}


def test_page_gates(spark):
    out = _run(
        spark,
        [
            (1, GOOD),  # 4 terminal-punct 8-word lines → keep
            (2, GOOD + "\nfunction f() { return 1; }"),  # brace page
            (3, GOOD + "\nthis site uses Lorem Ipsum filler."),  # lorem
            (4, "one two three four five six.\nshort line."),  # <3 sentences
        ],
    )
    assert out[1]["keep"] is True and out[1]["n_sentences"] == 4
    assert out[2]["keep"] is False and out[2]["has_brace"] is True
    assert out[3]["keep"] is False and out[3]["has_lorem"] is True
    # doc 4: the 6-word line keeps, 'short line.' (2 words) drops →
    # 1 sentence < 3
    assert out[4]["n_kept_lines"] == 1
    assert out[4]["keep"] is False


def test_line_filters(spark):
    out = _run(
        spark,
        [
            # no terminal punctuation → dropped regardless of length
            (1, "this line has plenty of words but no full stop\n" + GOOD),
            # javascript LINE removed, page survives on the other lines
            (2, GOOD + "\nplease enable javascript to see this content."),
        ],
    )
    assert out[1]["n_lines"] == 5 and out[1]["n_kept_lines"] == 4
    assert out[1]["keep"] is True
    assert out[2]["n_kept_lines"] == 4  # js line filtered, not the page
    assert out[2]["keep"] is True


def test_clean_md5_is_kept_text(spark):
    out = _run(spark, [(1, "noise line\n" + GOOD)])
    expect = hashlib.md5(GOOD.encode()).hexdigest()
    assert out[1]["clean_md5"] == expect


def test_empty_doc(spark):
    out = _run(spark, [(1, ""), (2, "no punctuation here at all")])
    for d in (1, 2):
        assert out[d]["n_kept_lines"] == 0
        assert out[d]["keep"] is False
        # empty kept set hashes the empty string on both engines
        assert out[d]["clean_md5"] == hashlib.md5(b"").hexdigest()


def test_in_row_plan_no_exchange(spark):
    df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    plan = c4_quality(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
