"""SSR-need detector (SURVEY §2.2 O14, §2.4 A5).

Semantics of reference features/extract/ssr-detector.ts with defaults
from lib/config.ts:71-83. In batch this is a metrics-only column —
there is no renderer (SURVEY §2.1 S4) — but the predicate itself is
kept at unit-test parity with the reference matrix
(tests/unit/features/extract/ssr-detector.test.ts).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..config import DEFAULT, EngineConfig

_SCRIPT_OPEN_RE = re.compile(r"<script[^>]*>", re.IGNORECASE)
_DATA_SCRIPT_MARKERS = (
    'type="application/ld+json"',
    'type="application/json"',
    'type="text/plain"',
)

_FRAMEWORK_PATTERNS = [
    re.compile(p)
    for p in (
        r"__NEXT_DATA__",
        r"__NUXT_DATA__",
        r"data-reactroot",
        r"data-react-helmet",
        r"ng-version=",
        r"__VUE__",
        r"webpackJsonp",
        r"_app-",
        r"id=[\"']__next[\"']",
        r"<app-root[\s>]",
        r"data-v-inspector=",
    )
] + [re.compile(r"hydrate", re.IGNORECASE)]

_SPA_ROOT_PATTERNS = [
    re.compile(p)
    for p in (
        r"<div[^>]*id=[\"']root[\"']",
        r"<div[^>]*id=[\"']app[\"']",
        r"<div[^>]*id=[\"']main[\"']",
        r"<div[^>]*id=[\"']__next[\"']",
        r"<div[^>]*class=[\"'][^\"']*spa[^\"']*[\"']",
        r"<div[^>]*class=[\"'][^\"']*app-root[^\"']*[\"']",
    )
]

_ARTICLE_PATTERNS = [
    re.compile(p, re.IGNORECASE)
    for p in (
        r"<article[^>]*>",
        r"<main[^>]*>",
        r"<div[^>]*class=[\"'][^\"']*content[^\"']*[\"']",
        r"<div[^>]*class=[\"'][^\"']*article[^\"']*[\"']",
        r"<div[^>]*class=[\"'][^\"']*post[^\"']*[\"']",
    )
]

_NOSCRIPT_RE = re.compile(r"<noscript[^>]*>([\s\S]*?)</noscript>", re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]*>")


@dataclass(frozen=True)
class SSRSignals:
    html_size: int
    script_ratio: float
    has_framework_markers: bool
    has_spa_structure: bool
    has_noscript_content: bool


def extract_signals(html: str, cfg: EngineConfig = DEFAULT) -> SSRSignals:
    size = len(html)
    scripts = _SCRIPT_OPEN_RE.findall(html)
    executable = [
        s for s in scripts if not any(marker in s for marker in _DATA_SCRIPT_MARKERS)
    ]
    ratio = len(executable) / max(size / cfg.ssr_script_divisor, 1.0)
    noscript_chunks = _NOSCRIPT_RE.findall(html)
    noscript_text = _TAG_RE.sub("", " ".join(noscript_chunks)).strip()
    return SSRSignals(
        html_size=size,
        script_ratio=ratio,
        has_framework_markers=any(p.search(html) for p in _FRAMEWORK_PATTERNS),
        has_spa_structure=any(p.search(html) for p in _SPA_ROOT_PATTERNS),
        has_noscript_content=len(noscript_text) > cfg.ssr_noscript_min_length,
    )


def ssr_score(signals: SSRSignals, cfg: EngineConfig = DEFAULT) -> float:
    score = 0.0
    if signals.html_size < cfg.ssr_html_size_threshold:
        score += cfg.ssr_weight_small_size
    if signals.script_ratio > cfg.ssr_script_ratio_threshold:
        score += cfg.ssr_weight_high_script_ratio
    if signals.has_framework_markers:
        score += cfg.ssr_weight_framework_markers
    if signals.has_spa_structure:
        score += cfg.ssr_weight_spa_structure
    if signals.has_noscript_content:
        score += cfg.ssr_weight_noscript_content
    return score


def has_article_content(html: str) -> bool:
    return any(p.search(html) for p in _ARTICLE_PATTERNS)


def needs_ssr(html: str, cfg: EngineConfig = DEFAULT) -> bool:
    """Short-circuit: small page with clear article content ⇒ no SSR
    (ssr-detector.ts:3-12); else weighted signal score vs threshold."""
    if len(html) < cfg.ssr_short_circuit_size and has_article_content(html):
        return False
    return ssr_score(extract_signals(html, cfg), cfg) >= cfg.ssr_threshold
