"""Column-expression implementations of the cheap per-row logic.

Everything here compiles to Catalyst expressions (whole-stage codegen,
no Python in the hot path) — the "cheap pre-filter before expensive
work" pattern the reference hand-builds (SURVEY §4): these predicates
gate which rows enter the expensive pandas UDFs, and because they are
pure Column exprs they also push down to the parquet/Iceberg scan.

Each function documents the reference behavior it reproduces.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig

# ---------------------------------------------------------------------------
# URL transforms (F1-F3, usecase.ts:295-326) as codegen'd regexes
# ---------------------------------------------------------------------------


def transform_amp_expr(url: Column) -> Column:
    """F1: strip '/amp/' mid-path or trailing '/amp' segments.

    Operates on full URLs; the path never contains '?'/'#' past the
    first delimiter, so the lookaheads keep query/fragment intact."""
    # trailing /amp or /amp/ at end-of-path (before ?, # or end)
    stripped = F.regexp_replace(url, r"/amp/?(?=[?#]|$)", "")
    # a root-path strip leaves a bare host — restore the '/' the URL
    # object would serialize (usecase.ts:306 `|| '/'`)
    stripped = F.regexp_replace(stripped, r"^(https?://[^/?#]+)($|\?|#)", r"$1/$2")
    return F.when(url.rlike(r"^[^?#]*/amp(/)?([?#]|$)"), stripped).otherwise(url)


def transform_mobile_expr(url: Column) -> Column:
    """F2: m. / mobile. host prefix → www. (usecase.ts:313-319)."""
    return F.regexp_replace(url, r"^(https?://)(?:mobile\.|m\.)", r"$1www.")


def transform_print_expr(url: Column) -> Column:
    """F3: drop lowercase print/plain query params (usecase.ts:321-326)."""
    # param in the middle: keep the leading delimiter, eat the trailing '&'
    u = F.regexp_replace(url, r"([?&])(?:print|plain)(=[^&#]*)?&", r"$1")
    # param at the end of the query
    u = F.regexp_replace(u, r"[?&](?:print|plain)(=[^&#]*)?(?=#|$)", "")
    # repeated params: run the middle rule once more (two params max in
    # practice; the pipeline composes idempotently)
    u = F.regexp_replace(u, r"([?&])(?:print|plain)(=[^&#]*)?&", r"$1")
    u = F.regexp_replace(u, r"[?&](?:print|plain)(=[^&#]*)?(?=#|$)", "")
    return u


def transform_url_expr(url: Column) -> Column:
    """amp ∘ mobile ∘ print in reference order (usecase.ts:295-300)."""
    return transform_print_expr(transform_mobile_expr(transform_amp_expr(url)))


# ---------------------------------------------------------------------------
# O1/O2 validation predicates (ssrf-guard.ts)
# ---------------------------------------------------------------------------

_BLOCKED_PORTS_RE = r":(?:22|3306|5432|6379|9200|27017)(?:/|$)"
_PRIVATE_HOST_RE = (
    r"^(?:localhost(?:\.localdomain)?|ip6-localhost|ip6-loopback|"
    r"127\..*|10\..*|0\..*|169\.254\..*|192\.168\..*|"
    r"172\.(?:1[6-9]|2[0-9]|3[01])\..*|"
    r"100\.(?:6[4-9]|[7-9][0-9]|1[01][0-9]|12[0-7])\..*|"
    r"192\.0\.0\..*|192\.0\.2\..*|198\.51\.100\..*|203\.0\.113\..*|"
    r"198\.1[89]\..*|2(?:2[4-9]|3[0-9]|4[0-9]|5[0-5])\..*|"
    r"\[?(?:::1|::ffff:.*|f[cd][0-9a-fA-F]{2}:.*|fe80:.*)\]?)$"
)


def is_valid_url_expr(url: Column) -> Column:
    """O1: scheme http/https, no embedded credentials, no blocked port."""
    return (
        url.rlike(r"^https?://")
        & ~url.rlike(r"^[a-z]+://[^/]*@")
        & ~url.rlike(r"^[a-z]+://[^/]*" + _BLOCKED_PORTS_RE)
    )


def host_is_private_expr(host: Column) -> Column:
    """O2 literal checks (ssrf-guard.ts:94-139; DNS branch is a batch
    non-goal, SURVEY §2.2)."""
    return F.lower(F.trim(host)).rlike(_PRIVATE_HOST_RE)


def route_tag_expr(host: Column) -> Column:
    """O4 hostname dispatch (usecase.ts:48-69)."""
    h = F.lower(host)
    return (
        F.when(h.rlike(r"(^|\.)stackoverflow\.com$"), F.lit("so"))
        .when(h.rlike(r"(^|\.)(reddit\.com|redd\.it)$"), F.lit("reddit"))
        .otherwise(F.lit("html"))
    )


# ---------------------------------------------------------------------------
# Quality scores as Column exprs (A1/A2)
# ---------------------------------------------------------------------------


def word_count_expr(text: Column) -> Column:
    """Python str.split() semantics: split on whitespace runs, drop
    empties (the A1 word-count nuance, SURVEY §7.2)."""
    return F.size(F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != F.lit("")))


def quality_score_expr(title: Column, text: Column, cfg: EngineConfig = DEFAULT) -> Column:
    """A1 (score_calculator.py:10-23) as a codegen'd expression."""
    length = F.length(text)
    words = word_count_expr(text)
    score = (
        F.log10(length.cast("double") + F.lit(1.0)) * F.lit(cfg.text_length_weight)
        + F.log10(words.cast("double") + F.lit(1.0)) * F.lit(cfg.word_count_weight)
        + F.when(
            title.isNotNull() & (F.length(title) > 0), F.lit(cfg.title_bonus)
        ).otherwise(F.lit(0.0))
    )
    return F.when(length > 0, score).otherwise(F.lit(0.0))


def readability_score_expr(text: Column, cfg: EngineConfig = DEFAULT) -> Column:
    """A2: len(text) × 0.8 (usecase.ts:287)."""
    return F.length(text).cast("double") * F.lit(cfg.readability_score_factor)


# ---------------------------------------------------------------------------
# SSR-need signal score (O14/A5) — metric column only, no renderer in batch
# ---------------------------------------------------------------------------


def needs_ssr_score_expr(html: Column, cfg: EngineConfig = DEFAULT) -> Column:
    """A5: weighted SSR signal sum (ssr-detector.ts:40-64). The
    framework/SPA/article regexes mirror the reference's pattern lists."""
    size = F.length(html).cast("double")
    scripts = F.regexp_count(html, F.lit(r"(?i)<script[^>]*>"))
    data_scripts = F.regexp_count(
        html,
        F.lit(
            r'(?i)<script[^>]*type="(?:application/ld\+json|application/json|text/plain)"[^>]*>'
        ),
    )
    script_ratio = (scripts - data_scripts).cast("double") / F.greatest(
        size / F.lit(float(cfg.ssr_script_divisor)), F.lit(1.0)
    )
    framework = html.rlike(
        r"__NEXT_DATA__|__NUXT_DATA__|data-reactroot|data-react-helmet|ng-version=|"
        r"__VUE__|webpackJsonp|_app-|id=[\"']__next[\"']|<app-root[\s>]|data-v-inspector="
    ) | html.rlike(r"(?i)hydrate")
    spa = html.rlike(
        r"<div[^>]*id=[\"'](?:root|app|main|__next)[\"']|"
        r"<div[^>]*class=[\"'][^\"']*(?:spa|app-root)[^\"']*[\"']"
    )
    # Noscript text-length signal needs tag-stripping inside the matches;
    # approximate JVM-side with total noscript-body length (an upper
    # bound; exact value computed in the UDF pass and recorded there).
    noscript_len = F.length(
        F.array_join(
            F.regexp_extract_all(html, F.lit(r"(?is)<noscript[^>]*>(.*?)</noscript>"), 1),
            " ",
        )
    )
    return (
        F.when(size < cfg.ssr_html_size_threshold, F.lit(cfg.ssr_weight_small_size)).otherwise(0.0)
        + F.when(
            script_ratio > cfg.ssr_script_ratio_threshold,
            F.lit(cfg.ssr_weight_high_script_ratio),
        ).otherwise(0.0)
        + F.when(framework, F.lit(cfg.ssr_weight_framework_markers)).otherwise(0.0)
        + F.when(spa, F.lit(cfg.ssr_weight_spa_structure)).otherwise(0.0)
        + F.when(
            noscript_len > cfg.ssr_noscript_min_length, F.lit(cfg.ssr_weight_noscript_content)
        ).otherwise(0.0)
    )


def has_article_content_expr(html: Column) -> Column:
    return html.rlike(
        r"(?i)<article[^>]*>|<main[^>]*>|"
        r"<div[^>]*class=[\"'][^\"']*(?:content|article|post)[^\"']*[\"']"
    )


def needs_ssr_expr(html: Column, cfg: EngineConfig = DEFAULT) -> Column:
    """O14 with the size+article short-circuit (ssr-detector.ts:3-12)."""
    return F.when(
        (F.length(html) < cfg.ssr_short_circuit_size) & has_article_content_expr(html),
        F.lit(False),
    ).otherwise(needs_ssr_score_expr(html, cfg) >= cfg.ssr_threshold)


# ---------------------------------------------------------------------------
# F10 id predicates
# ---------------------------------------------------------------------------


def question_id_expr(url: Column) -> Column:
    return F.regexp_extract(url, r"/questions/(\d+)\b", 1)


def is_reddit_thread_expr(url: Column) -> Column:
    return url.rlike(r"/comments/[A-Za-z0-9]+")
