"""A1/A2 score vectors (reference:
apps/extractor/tests/services/test_score_calculator.py:6-40)."""

import math

import pytest

from claude_readability_hook_spark.core.scoring import quality_score, readability_score


def test_empty_text_scores_zero():
    assert quality_score(None, "") == 0.0
    assert quality_score("Title", "") == 0.0


def test_minimal_text_with_title_in_5_6():
    # ("T","a"): log10(2)*0.8 + log10(2)*0.2 + 5 ∈ [5, 6]
    s = quality_score("T", "a")
    assert 5.0 <= s <= 6.0


def test_title_bonus_exactly_5():
    text = "some reasonable text content here"
    assert quality_score("Title", text) - quality_score(None, text) == pytest.approx(5.0)


def test_monotone_in_length():
    a = quality_score(None, "short text")
    b = quality_score(None, "short text " * 50)
    assert b > a


def test_word_count_python_split_semantics():
    # multi-space runs collapse; leading/trailing dropped — str.split()
    text = "  hello   world  "
    expected = math.log10(len(text) + 1) * 0.8 + math.log10(2 + 1) * 0.2
    assert quality_score(None, text) == pytest.approx(expected)


def test_readability_score_is_len_times_factor():
    assert readability_score("abcd") == pytest.approx(3.2)
    assert readability_score("") == 0.0
