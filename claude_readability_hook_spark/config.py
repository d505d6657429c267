"""Engine configuration constants.

Defaults mirror the reference's env-default config
(reference: apps/gateway/src/lib/config.ts:55-107,
apps/extractor/app/services/score_calculator.py:4-23) so that the
observable contract — thresholds, weights, limits — matches.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class EngineConfig:
    # Engine selection (reference: lib/config.ts:68-69).
    # NOTE: the reference's quality score is log-scaled (max ~10) while the
    # default threshold is 50, so at default config the recall
    # ("readability") pass always wins — faithful to observed behavior.
    score_threshold: float = 50.0
    readability_score_factor: float = 0.8

    # Quality score weights (reference: score_calculator.py:5-8).
    text_length_weight: float = 0.8
    word_count_weight: float = 0.2
    title_bonus: float = 5.0

    # SSR detection (reference: lib/config.ts:71-83, ssr-detector.ts).
    ssr_threshold: float = 4.0
    ssr_html_size_threshold: int = 5000
    ssr_script_ratio_threshold: float = 0.1
    ssr_script_divisor: int = 1000
    ssr_noscript_min_length: int = 50
    ssr_short_circuit_size: int = 60000
    ssr_weight_small_size: float = 3.0
    ssr_weight_high_script_ratio: float = 2.0
    ssr_weight_framework_markers: float = 4.0
    ssr_weight_spa_structure: float = 2.5
    ssr_weight_noscript_content: float = 2.0

    # Code truncation (reference: lib/text-utils.ts:1).
    max_code_lines: int = 200

    # Domain handlers (reference: lib/config.ts:90-95).
    so_top_answers_limit: int = 5
    reddit_toplevel_limit: int = 20
    reddit_replies_per_top_limit: int = 5

    # Handler composite score weights
    # (reference: handlers/stackoverflow/usecase.ts:136-140,
    #  handlers/reddit/usecase.ts:135-141).
    so_question_points: float = 200.0
    so_answer_points: float = 180.0
    so_author_points: float = 120.0
    so_length_factor: float = 0.45
    reddit_comment_points: float = 100.0
    reddit_vote_factor: float = 2.0
    reddit_author_points: float = 80.0
    reddit_length_factor: float = 0.3

    # Fetch safety (reference: lib/config.ts:97-99).
    max_html_bytes: int = 10_485_760
    blocked_ports: tuple[int, ...] = (22, 3306, 5432, 6379, 9200, 27017)

    # Scale machinery (ours: north_rule skew handling).
    giant_doc_bytes: int = 1_048_576  # docs above this get their own salt stripe
    target_partition_bytes: int = 64 * 1024 * 1024  # ~ one Arrow batch of HTML

    # Staleness / re-extraction policy — the batch analog of the
    # reference's 24h LRU TTL (lib/cache.ts:12-22). Committed rows from
    # an older engine_version are re-extracted on the next run; set
    # reextract_ttl_hours to also age out rows by wall clock (None =
    # version-based staleness only, the safe batch default).
    engine_version: int = 2
    reextract_ttl_hours: float | None = None


DEFAULT = EngineConfig()
