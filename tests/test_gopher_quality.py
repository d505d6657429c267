"""Full Gopher word-level rule set (textstats.gopher_quality):
hand-built documents tripping each rule in isolation, exact ratio
arithmetic, and the no-shuffle plan claim."""

from __future__ import annotations

from claude_readability_hook_spark.operators.textstats import gopher_quality

# 60 prose words with >=2 required stopwords; every rule passes.
GOOD = " ".join(["the quick brown fox jumps over that lazy sleeping dog"] * 6)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in gopher_quality(df, **kw).collect()}


def test_good_prose_keeps(spark):
    out = _run(spark, [(1, GOOD)])
    r = out[1]
    assert r["n_words"] == 60
    assert r["keep"] is True
    assert r["alpha_word_frac"] == 1.0
    assert r["req_stop_hits"] == 2  # 'the' and 'that' from the 8-word list


def test_each_rule_trips_alone(spark):
    out = _run(
        spark,
        [
            (1, "short doc"),  # word count below minimum
            (2, GOOD + " " + " ".join(["#tag"] * 10)),  # hash ratio 10/70 > 0.1
            (3, GOOD + " " + " ".join(["see..."] * 10)),  # ellipsis ratio > 0.1
            (4, "\n".join(["- item"] * 10) + "\n" + GOOD.replace(" ", "\n")),
            (5, GOOD + " " + " ".join(["12345"] * 20)),  # alpha frac 60/80 < 0.8
            (6, " ".join(["lorem ipsum dolor sit amet"] * 12)),  # no stopwords
        ],
    )
    assert out[1]["keep"] is False and out[1]["n_words"] == 2
    assert out[2]["keep"] is False and out[2]["hash_ratio"] > 0.1
    assert out[3]["keep"] is False and out[3]["ellipsis_ratio"] > 0.1
    # doc 4: 10 bullet lines of 70 total → frac 10/70 ≈ 0.142857 < 0.9,
    # every other rule passes — a minority of list lines must NOT drop
    # an otherwise healthy page (the rule is >=90% bullet-dominated).
    assert out[4]["bullet_line_frac"] == 0.142857
    assert out[4]["keep"] is True
    assert out[5]["keep"] is False and out[5]["alpha_word_frac"] == 0.75
    assert out[6]["keep"] is False and out[6]["req_stop_hits"] == 0


def test_line_rules(spark):
    # 20 bullet lines, each '- item list x y z' (6 words) → 120 words,
    # bullet_line_frac 1.0 → drop despite healthy words.
    bullets = "\n".join(["- item list alpha beta gamma"] * 20)
    # 15 ellipsis-terminated lines, 4 words each → 60 words, frac 1.0.
    ells = "\n".join(["see the story more..."] * 15)
    out = _run(spark, [(1, bullets), (2, ells)])
    assert out[1]["bullet_line_frac"] == 1.0 and out[1]["keep"] is False
    assert out[2]["ellipsis_line_frac"] == 1.0 and out[2]["keep"] is False
    assert out[2]["ellipsis_ratio"] == 0.25  # 15 '...' over 60 words


def test_mean_word_length_bounds(spark):
    # 60 one-char words → mean 1 < 3; 60 twelve-char words → mean 12 > 10
    ones = " ".join(["a"] * 60)
    longs = " ".join(["abcdefghijkl"] * 60)
    out = _run(spark, [(1, ones), (2, longs)])
    assert out[1]["mean_word_len"] == 1.0 and out[1]["keep"] is False
    assert out[2]["mean_word_len"] == 12.0 and out[2]["keep"] is False


def test_empty_and_zero_guards(spark):
    out = _run(spark, [(1, ""), (2, "   ")])
    for d in (1, 2):
        assert out[d]["n_words"] == 0
        assert out[d]["keep"] is False
        assert out[d]["alpha_word_frac"] == 0.0


def test_in_row_plan_no_exchange(spark):
    df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    plan = gopher_quality(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure in-row: nothing shuffles
