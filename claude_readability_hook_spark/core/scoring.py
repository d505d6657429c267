"""Quality scores (SURVEY §2.4 A1/A2).

A1 mirrors the reference's ScoreCalculator exactly
(apps/extractor/app/services/score_calculator.py:4-23); note the
word-count uses Python str.split() semantics (multi-whitespace split,
empties dropped) — asserted by golden tests.

A2 is the Readability-fallback score: len(text) × 0.8
(features/extract/usecase.ts:287, lib/config.ts:69).
"""

from __future__ import annotations

import math
from typing import Optional

TEXT_LENGTH_WEIGHT = 0.8
WORD_COUNT_WEIGHT = 0.2
TITLE_BONUS = 5.0
READABILITY_SCORE_FACTOR = 0.8


def quality_score(title: Optional[str], text: str) -> float:
    """A1: log10(len+1)*0.8 + log10(words+1)*0.2 + (title ? 5 : 0)."""
    if not text:
        return 0.0
    length = len(text)
    word_count = len(text.split())
    return (
        math.log10(length + 1) * TEXT_LENGTH_WEIGHT
        + math.log10(word_count + 1) * WORD_COUNT_WEIGHT
        + (TITLE_BONUS if title else 0.0)
    )


def readability_score(text: str) -> float:
    """A2: len(text) × readability factor."""
    return len(text) * READABILITY_SCORE_FACTOR
