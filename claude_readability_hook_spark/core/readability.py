"""From-scratch Readability-style main-content extractor.

This is the north-star component: the replacement for the reference's
two third-party engines — trafilatura with favor_precision=True
(apps/extractor/app/services/trafilatura_extractor.py:15-37) and
Mozilla Readability (apps/gateway/src/clients/readability.ts:36-44).
We implement ONE scorer with two tuned parameter sets whose observable
contract matches the reference's engine pair:

  PRECISION  — boilerplate-averse, drops borderline blocks
               (trafilatura favor_precision analog)
  RECALL     — keeps more, longer but noisier text
               (Readability-fallback analog)

Algorithm (classic content-density family; cf. Readability.js /
boilerpipe, public domain knowledge):
  1. strip non-content tags + negative-class/id subtrees
  2. score text-bearing blocks: points = 1 + commas + len/100 (capped),
     credited to parent (full) and grandparent (half); candidates get a
     tag-weight and class/id-weight prior
  3. best candidate = max score × (1 − link_density)
  4. assemble: candidate subtree + qualifying siblings
  5. serialize block elements to paragraphs, preserving placeholder
     text nodes (__CODEBLOCK_n__ / media refs) in document order
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional

from .dom import (
    BLOCK_TAGS,
    Annotations,
    Node,
    ann_link_density,
    annotate,
    parse_html,
)
from .textnorm import normalize_text

# Tags never part of main content.
STRIP_TAGS = frozenset(
    "script style noscript nav footer header aside form iframe button "
    "svg select option template object embed applet map area label "
    "input textarea".split()
)

# Class/id signals (same heuristic family as Readability's
# REGEXPS.unlikelyCandidates / positive / negative — public algorithm).
NEGATIVE_RE = re.compile(
    r"combx|comment|community|disqus|extra|foot|header|menu|nav|remark|rss|"
    r"share|shoutbox|sidebar|sponsor|ad-|advert|banner|widget|promo|related|"
    r"social|breadcrumb|pager|pagination|popup|tweet|twitter|masthead|"
    r"subscribe|signup|cookie",
    re.IGNORECASE,
)
POSITIVE_RE = re.compile(
    r"article|body|content|entry|hentry|main|page|post|text|blog|story",
    re.IGNORECASE,
)

# Tag-weight prior for candidate containers.
TAG_WEIGHTS = {
    "article": 10.0,
    "main": 10.0,
    "section": 5.0,
    "div": 5.0,
    "body": 0.0,
    "blockquote": 3.0,
    "td": 3.0,
    "figure": 0.0,
    "ol": -3.0,
    "ul": -3.0,
    "dl": -3.0,
    "li": -3.0,
    "address": -3.0,
    "form": -3.0,
    "th": -5.0,
}

CLASS_WEIGHT = 25.0

# Text-bearing leaf blocks that feed candidate scores.
PARAGRAPH_TAGS = frozenset({"p", "pre", "td", "blockquote", "h1", "h2", "h3", "h4", "h5", "h6"})

_PLACEHOLDER_RE = re.compile(r"__CODEBLOCK_\d+__|__MEDIA_[A-Za-z0-9:_\-]+__")


@dataclass(frozen=True)
class ExtractorSettings:
    """One scorer, two contracts (SURVEY §2.12)."""

    name: str
    min_paragraph_chars: int  # shorter leaf blocks contribute/serialize only with commas
    max_link_density: float  # candidate text above this is dropped
    sibling_score_ratio: float  # siblings of the winner join above ratio×top
    keep_lists: bool  # serialize <ul>/<ol>/<dl> inside the winner
    body_fallback: bool  # no candidate ⇒ whole-body text instead of failure


PRECISION = ExtractorSettings(
    name="precision",
    min_paragraph_chars=25,
    max_link_density=0.30,
    sibling_score_ratio=0.25,
    keep_lists=False,
    body_fallback=False,
)

RECALL = ExtractorSettings(
    name="recall",
    min_paragraph_chars=10,
    max_link_density=0.60,
    sibling_score_ratio=0.10,
    keep_lists=True,
    body_fallback=True,
)


@dataclass
class ExtractionResult:
    title: Optional[str]
    text: str  # normalized prose with placeholders still embedded
    success: bool
    error: Optional[str] = None


# ---------------------------------------------------------------------------
# Title (reference precedence: og:title → <title> → first <h1>;
# trafilatura_extractor.py:17,35 uses extract_metadata().title)
# ---------------------------------------------------------------------------


def extract_title(root: Node) -> Optional[str]:
    for meta in root.iter_elements("meta"):
        if meta.attrs.get("property") == "og:title" and meta.attrs.get("content", "").strip():
            return meta.attrs["content"].strip()
    for title in root.iter_elements("title"):
        t = title.text_content().strip()
        if t:
            return t
    for h1 in root.iter_elements("h1"):
        t = h1.text_content().strip()
        if t:
            return t
    return None


# ---------------------------------------------------------------------------
# Boilerplate strip
# ---------------------------------------------------------------------------


def strip_boilerplate(root: Node) -> None:
    """Remove non-content tags and negative-class/id subtrees in place."""
    doomed: list[Node] = []
    for node in root.iter():
        if node.tag is None or node.tag == "#root":
            continue
        if node.tag in STRIP_TAGS:
            doomed.append(node)
            continue
        signal = node.class_and_id()
        if signal.strip() and NEGATIVE_RE.search(signal) and not POSITIVE_RE.search(signal):
            if node.tag != "body":
                doomed.append(node)
    for node in doomed:
        if node.parent is not None:  # ancestor may already be gone
            node.detach()


# ---------------------------------------------------------------------------
# Candidate scoring
# ---------------------------------------------------------------------------


def _class_weight(node: Node) -> float:
    signal = node.class_and_id()
    weight = 0.0
    if POSITIVE_RE.search(signal):
        weight += CLASS_WEIGHT
    if NEGATIVE_RE.search(signal):
        weight -= CLASS_WEIGHT
    return weight


def _initial_score(node: Node) -> float:
    return TAG_WEIGHTS.get(node.tag or "", 0.0) + _class_weight(node)


def score_candidates(
    root: Node, settings: ExtractorSettings, ann: Annotations
) -> dict[int, tuple[Node, float]]:
    """Return {id(node): (node, score)} for every candidate container.
    All text statistics come from the one-pass annotations — no
    per-candidate subtree walks."""
    candidates: dict[int, tuple[Node, float]] = {}

    def credit(node: Optional[Node], points: float) -> None:
        if node is None or node.tag in (None, "#root", "html"):
            return
        key = id(node)
        if key not in candidates:
            candidates[key] = (node, _initial_score(node))
        candidates[key] = (node, candidates[key][1] + points)

    for para in root.iter():
        if para.tag not in PARAGRAPH_TAGS:
            continue
        n, _link, commas, has_placeholder, nonws = ann[id(para)]
        if not nonws and not has_placeholder:
            continue
        # Placeholders count as content anchors: a paragraph holding a
        # lifted code block must keep its neighborhood alive.
        if n < settings.min_paragraph_chars and not has_placeholder:
            continue
        points = 1.0 + commas + min(n / 100.0, 3.0)
        if has_placeholder:
            points += 2.0
        credit(para.parent, points)
        credit(para.parent.parent if para.parent else None, points / 2.0)

    return candidates


def best_candidate(
    candidates: dict[int, tuple[Node, float]],
    settings: ExtractorSettings,
    ann: Annotations,
) -> Optional[tuple[Node, float]]:
    best: Optional[tuple[Node, float]] = None
    for node, raw in candidates.values():
        adjusted = raw * (1.0 - ann_link_density(ann, node))
        if best is None or adjusted > best[1]:
            best = (node, adjusted)
    if best is None:
        return None
    node, score = best
    if ann_link_density(ann, node) > settings.max_link_density:
        return None
    return node, score


# ---------------------------------------------------------------------------
# Serialization
# ---------------------------------------------------------------------------

_SKIP_SERIALIZE = frozenset({"ul", "ol", "dl"})


def _serialize(
    node: Node, settings: ExtractorSettings, out: list[str], ann: Annotations
) -> None:
    """Emit paragraph strings from a subtree in document order. Cheap
    skip decisions come from the annotations; text is only materialized
    for nodes actually emitted."""
    if node.tag is None:
        text = node.text.strip()
        if text:
            out.append(text)
        return
    if node.tag in _SKIP_SERIALIZE and not settings.keep_lists:
        return
    if node.tag in PARAGRAPH_TAGS:
        _n, _link, _commas, has_placeholder, nonws = ann[id(node)]
        if not nonws and not has_placeholder:
            return
        text = " ".join(node.text_content().split())
        if has_placeholder:
            # Keep placeholders on their own line so splice-back produces
            # clean fenced blocks.
            out.append(text)
            return
        if len(text) >= settings.min_paragraph_chars or "," in text:
            if ann_link_density(ann, node) <= settings.max_link_density:
                out.append(text)
        return
    for child in node.children:
        _serialize(child, settings, out, ann)


def assemble_text(
    top: Node, candidates: dict[int, tuple[Node, float]], top_score: float,
    settings: ExtractorSettings, ann: Annotations,
) -> str:
    """Serialize the winning candidate plus qualifying siblings
    (Readability's sibling-merge step, re-derived)."""
    pieces: list[str] = []
    siblings = top.parent.children if top.parent is not None else [top]
    threshold = max(10.0, top_score * settings.sibling_score_ratio)
    for sib in siblings:
        if sib is top:
            _serialize(sib, settings, pieces, ann)
            continue
        if sib.tag is None:
            text = sib.text.strip()
            if text:
                pieces.append(text)
            continue
        sib_entry = candidates.get(id(sib))
        sib_score = sib_entry[1] if sib_entry else 0.0
        if sib_score >= threshold:
            _serialize(sib, settings, pieces, ann)
        elif sib.tag == "p":
            _serialize(sib, settings, pieces, ann)
    return "\n\n".join(p for p in pieces if p)


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------


def extract_main_content(
    html: str, settings: ExtractorSettings = PRECISION
) -> ExtractionResult:
    """Extract title + main prose from one HTML string.

    The input may contain __CODEBLOCK_n__ / __MEDIA_*__ placeholder text
    nodes (from codeblocks.lift_code_blocks / the span assembler); they
    survive extraction in document order — the span-equality invariant.
    """
    if not html or not html.strip():
        return ExtractionResult(None, "", False, "empty html")

    root = parse_html(html)
    title = extract_title(root)
    strip_boilerplate(root)
    ann = annotate(root)
    candidates = score_candidates(root, settings, ann)
    best = best_candidate(candidates, settings, ann)

    if best is None:
        if settings.body_fallback:
            pieces: list[str] = []
            body = next(root.iter_elements("body"), root)
            _serialize(body, settings, pieces, ann)
            text = normalize_text("\n\n".join(pieces))
            if text:
                return ExtractionResult(title, text, True)
        return ExtractionResult(title, "", False, "no content candidate")

    top, top_score = best
    text = normalize_text(assemble_text(top, candidates, top_score, settings, ann))
    if not text:
        if settings.body_fallback:
            pieces = []
            body = next(root.iter_elements("body"), root)
            _serialize(body, settings, pieces, ann)
            text = normalize_text("\n\n".join(pieces))
        if not text:
            return ExtractionResult(title, "", False, "no content candidate")
    return ExtractionResult(title, text, True)
