"""Char-n-gram language ID (operators/langid.py): fixture accuracy,
differential vs the 4-language stopword heuristic, the descending-
sequence guard, the 'und' fallback, tie-break determinism, and the
broadcast/shuffle regime equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from claude_readability_hook_spark.operators.langid import (
    char_ngrams_expr,
    classify_lang_ngram,
    synthesize_langid_corpus,
    train_char_ngram_profiles,
)
from claude_readability_hook_spark.operators.textstats import language_id


def _fixture_preds(spark):
    corpus = synthesize_langid_corpus(spark)
    profiles = train_char_ngram_profiles(corpus.filter("is_train"))
    test = corpus.filter("NOT is_train")
    preds = classify_lang_ngram(test, profiles).join(
        test.select("doc_id", "lang_true", "text"), "doc_id"
    )
    return preds.collect()


def test_fixture_accuracy_and_cjk(spark):
    rows = _fixture_preds(spark)
    assert len(rows) == 9 * 8
    acc = sum(r.lang_pred == r.lang_true for r in rows) / len(rows)
    assert acc >= 0.95
    # non-romance scripts/languages separate perfectly: the romance
    # cluster (es/pt/it vocab overlap) is where honest confusion lives
    hard = [r for r in rows if r.lang_true in ("en", "de", "nl", "sv", "ja")]
    assert all(r.lang_pred == r.lang_true for r in hard)
    assert all(r.score_micro > 0 for r in rows)


def test_beats_stopword_heuristic(spark):
    """The motivating differential (VERDICT r6 #5): the stopword
    argmax knows 4 languages and needs whole-word hits. On the
    en/de/fr/es subset the trigram classifier is at least as accurate;
    beyond that subset the stopword path cannot even name the
    language."""
    rows = _fixture_preds(spark)
    sub = [r for r in rows if r.lang_true in ("en", "de", "fr", "es")]
    stop_preds = {
        r.doc_id: r.lang_pred
        for r in language_id(
            _df_from(spark, sub), text_col="text"
        ).collect()
    }
    ngram_acc = sum(r.lang_pred == r.lang_true for r in sub) / len(sub)
    stop_acc = sum(stop_preds[r.doc_id] == r.lang_true for r in sub) / len(sub)
    assert ngram_acc >= stop_acc
    # out-of-repertoire languages: stopword path is structurally blind
    outside = [r for r in rows if r.lang_true in ("ja", "sv", "nl")]
    stop_outside = {
        r.doc_id: r.lang_pred
        for r in language_id(_df_from(spark, outside), text_col="text").collect()
    }
    assert all(v not in ("ja", "sv", "nl") for v in stop_outside.values())
    assert all(r.lang_pred == r.lang_true for r in outside)


def _df_from(spark, rows):
    return spark.createDataFrame(
        [{"doc_id": r.doc_id, "text": r.text} for r in rows]
    )


def test_short_string_guard_and_multibyte_gram_count(spark):
    df = spark.createDataFrame(
        [("a", "xy"), ("b", ""), ("c", "はをにがで"), ("d", "abcd")],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r.g
        for r in df.select(
            "doc_id", char_ngrams_expr(F.col("text")).alias("g")
        ).collect()
    }
    assert out["a"] == [] and out["b"] == []
    # code-point semantics: 5 hiragana chars -> 3 trigrams
    assert out["c"] == ["はをに", "をにが", "にがで"]
    assert out["d"] == ["abc", "bcd"]


def test_unseen_grams_predict_und(spark):
    corpus = synthesize_langid_corpus(spark)
    profiles = train_char_ngram_profiles(corpus.filter("is_train"))
    df = spark.createDataFrame([("x", "0123456789 98765")], ["doc_id", "text"])
    row = classify_lang_ngram(df, profiles).first()
    assert row.lang_pred == "und" and row.score_micro == 0


def test_tie_breaks_alphabetically(spark):
    profiles = spark.createDataFrame(
        [("zz", "abc", 100), ("aa", "abc", 100)], ["lang", "gram", "w_micro"]
    )
    df = spark.createDataFrame([("x", "abc")], ["doc_id", "text"])
    row = classify_lang_ngram(df, profiles).first()
    assert row.lang_pred == "aa" and row.score_micro == 100


def test_shuffle_regime_matches_broadcast(spark):
    corpus = synthesize_langid_corpus(spark)
    profiles = train_char_ngram_profiles(corpus.filter("is_train"))
    test = corpus.filter("NOT is_train")
    a = sorted(
        map(tuple, classify_lang_ngram(test, profiles).collect())
    )
    b = sorted(
        map(
            tuple,
            classify_lang_ngram(
                test, profiles, broadcast_profiles=False
            ).collect(),
        )
    )
    assert a == b
