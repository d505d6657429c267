"""Per-document extraction over interleaved spans.

The document enters as an ordered span list
``(kind, text, media_ref, offset)`` and leaves the same shape with
boilerplate stripped. This generalizes the reference's placeholder
dance (code-block-preserver.ts:14-68): lifted code blocks ARE spans,
media spans pass through untouched, and surviving content keeps its
original relative order — the span-sequence-equality invariant.

Engine control flow (SURVEY §2.12, usecase.ts:150-156 + 267-293):
  1. domain handler short-circuit for so_json / reddit_json spans
     (fall back to the HTML pipeline on parse failure, like orElse)
  2. precision pass; accept iff quality score ≥ threshold
  3. recall pass on the same spans (engine='recall', score=len×0.8)

The fallback runs inside the same UDF call rather than as a second
Spark stage: at 100 TB a filter+union re-pass would re-read the giant
html column from the shuffle; branching per document in the batch
touches each byte exactly once and keeps the selective-reprocessing
semantics (only low-score docs pay for pass 2).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from typing import Any, Optional

from ..config import DEFAULT, EngineConfig
from . import scoring
from .codeblocks import CodeBlock, lift_code_blocks, render_code_block, truncate_code_body
from .dom import parse_html
from .formatters import format_reddit_json, format_so_json
from .medialift import MediaItem, lift_media
from .readability import PRECISION, RECALL, ExtractorSettings, extract_main_content, extract_title
from .ssr import needs_ssr
from .textnorm import normalize_text

_PLACEHOLDER_SPLIT = re.compile(r"(__CODEBLOCK_\d+__|__MEDIA_\d+__)")

ENGINE_PRECISION = "precision"
ENGINE_RECALL = "recall"
ENGINE_SO = "so-api"
ENGINE_REDDIT = "reddit-json"


@dataclass
class DocResult:
    doc_id: str
    title: Optional[str]
    engine: str
    score: float
    success: bool
    error: Optional[str]
    needs_ssr: bool
    spans: list[dict[str, Any]] = field(default_factory=list)


def _mk_span(kind: str, text: str, media_ref: str, offset: int) -> dict[str, Any]:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def _renumber(spans: list[dict[str, Any]]) -> list[dict[str, Any]]:
    for i, s in enumerate(spans):
        s["offset"] = i
    return spans


def _spans_to_segments(
    extracted_text: str,
    blocks: dict[str, CodeBlock],
    media: dict[str, MediaItem] | None = None,
) -> list[dict[str, Any]]:
    """Split extracted prose on placeholder tokens into alternating
    text / code spans, preserving first-appearance order (the analog of
    restoreInText's indexOf sort, code-block-preserver.ts:56-58).

    Inline code splices back into the surrounding prose as `` `x` ``
    (the reference's isInline branch, code-block-preserver.ts:60-61) —
    only block-level code becomes its own span."""
    out: list[dict[str, Any]] = []
    buffer: list[str] = []

    def flush() -> None:
        if buffer:
            text = normalize_text("".join(buffer))
            if text:
                out.append(_mk_span("text", text, "", 0))
            buffer.clear()

    media = media or {}
    for piece in _PLACEHOLDER_SPLIT.split(extracted_text):
        if not piece:
            continue
        block = blocks.get(piece)
        item = media.get(piece)
        if block is not None:
            if block.is_inline:
                buffer.append(f"`{block.content}`")
            else:
                flush()
                out.append(
                    _mk_span(
                        "code",
                        truncate_code_body(block.content),
                        block.id if not block.language else f"{block.id}:{block.language}",
                        0,
                    )
                )
        elif item is not None:
            flush()
            out.append(_mk_span("media", item.alt, item.media_ref, 0))
        else:
            buffer.append(piece)
    flush()
    return out


def _rendered_text(spans: list[dict[str, Any]]) -> str:
    """Flatten output spans to the single text blob the reference's
    scorer sees (code rendered as fenced markdown, media as nothing)."""
    parts: list[str] = []
    for s in spans:
        if s["kind"] == "text":
            parts.append(s["text"])
        elif s["kind"] == "code":
            ref = s["media_ref"]
            lang = ref.split(":", 2)[2] if ref.count(":") >= 2 else None
            parts.append(
                render_code_block(
                    CodeBlock(id=ref, content=s["text"], language=lang, is_inline=False),
                    truncate=False,
                ).strip()
            )
    return "\n\n".join(p for p in parts if p)


def _html_pass(
    ordered: list[dict[str, Any]], settings: ExtractorSettings
) -> tuple[Optional[str], list[dict[str, Any]], bool, Optional[str]]:
    """One extraction pass over the span list. Returns
    (title, out_spans, success, error)."""
    out: list[dict[str, Any]] = []
    title: Optional[str] = None
    any_content = False
    any_html = False
    block_counter = 0  # per-document: placeholder ids unique across spans
    media_counter = 0

    for span in ordered:
        kind = span["kind"]
        text = span["text"] or ""
        if kind == "html":
            any_html = True
            root = parse_html(text)
            if title is None:
                title = extract_title(root)
            blocks = lift_code_blocks(root, start=block_counter)
            block_counter += len(blocks)
            media = lift_media(root, start=media_counter)
            media_counter += len(media)
            # Re-serialize is unnecessary: extraction runs on the mutated
            # tree directly (placeholders are text nodes already).
            result = _extract_from_tree(root, blocks, settings, media)
            if result is not None:
                out.extend(result)
                any_content = True
        elif kind == "text":
            norm = normalize_text(text)
            if norm:
                out.append(_mk_span("text", norm, "", 0))
                any_content = True
        elif kind == "code":
            out.append(_mk_span("code", truncate_code_body(text), span["media_ref"] or "", 0))
            any_content = True
        elif kind == "media":
            out.append(_mk_span("media", text, span["media_ref"] or "", 0))
        elif kind == "pdf":
            # payload arrives base64 in the text field (spans are
            # string-typed); content-stream decode + layout parse are
            # real (core/pdflayout.py), and embedded /Image XObjects
            # lift through the JPEG decoder into media spans — the
            # interleaved-span analog of the in-HTML <img> lift
            import base64

            from .pdflayout import pdf_to_content

            try:
                payload = base64.b64decode(text or "")
            except Exception:
                payload = b""
            pdf_text, pdf_images, _status = pdf_to_content(payload)
            if pdf_text:
                out.append(_mk_span("text", normalize_text(pdf_text), "", 0))
                any_content = True
            for i, im in enumerate(pdf_images):
                if im["status"] == "ok":
                    out.append(_mk_span("media", "", f"pdfimg:{i}", 0))
        else:  # unknown / json kinds reaching the html pass: treat as text
            norm = normalize_text(text)
            if norm:
                out.append(_mk_span("text", norm, "", 0))
                any_content = True

    if any_html and not any_content:
        return title, [], False, "no content candidate"
    if not any_content and not any(s["kind"] == "media" for s in out):
        return title, [], False, "empty document"
    return title, _renumber(out), True, None


def _extract_from_tree(
    root, blocks: dict[str, CodeBlock], settings, media: dict[str, MediaItem] | None = None
) -> Optional[list[dict]]:
    """Run the readability scorer on an already-parsed (and code-lifted)
    tree, returning interleaved text/code spans, or None on failure."""
    from .dom import annotate
    from .readability import (  # local import keeps module init light
        assemble_text,
        best_candidate,
        score_candidates,
        strip_boilerplate,
    )

    strip_boilerplate(root)
    ann = annotate(root)
    candidates = score_candidates(root, settings, ann)
    best = best_candidate(candidates, settings, ann)
    text: str = ""
    if best is not None:
        top, top_score = best
        text = normalize_text(assemble_text(top, candidates, top_score, settings, ann))
    if not text and settings.body_fallback:
        from .readability import _serialize

        pieces: list[str] = []
        body = next(root.iter_elements("body"), root)
        _serialize(body, settings, pieces, ann)
        text = normalize_text("\n\n".join(pieces))
    if not text:
        return None
    return _spans_to_segments(text, blocks, media)


def extract_document(
    doc_id: str, spans: list[dict[str, Any]], cfg: EngineConfig = DEFAULT
) -> DocResult:
    """Extract one document. ``spans`` is the raw input span list (any
    order; sorted here by offset)."""
    ordered = sorted(spans, key=lambda s: s["offset"])

    html_blob = "".join(s["text"] or "" for s in ordered if s["kind"] == "html")
    ssr_flag = needs_ssr(html_blob, cfg) if html_blob else False

    # 1. Domain-handler short-circuit (O4 routing by span kind; the
    #    hostname dispatch happens upstream as a Column expr — by the
    #    time spans carry so_json/reddit_json kinds the route is known).
    for span in ordered:
        if span["kind"] == "so_json":
            hr = format_so_json(span["text"] or "", cfg)
            if hr.success:
                return DocResult(
                    doc_id, hr.title, ENGINE_SO, hr.score, True, None, ssr_flag,
                    _renumber([_mk_span("text", hr.text, "", 0)]),
                )
            break  # parse failure → default pipeline (orElse)
        if span["kind"] == "reddit_json":
            hr = format_reddit_json(span["text"] or "", cfg)
            if hr.success:
                return DocResult(
                    doc_id, hr.title, ENGINE_REDDIT, hr.score, True, None, ssr_flag,
                    _renumber([_mk_span("text", hr.text, "", 0)]),
                )
            break

    # 2. Precision pass — skipped when it provably cannot win: the A1
    #    score is bounded by log10(max_bytes+1)·(0.8+0.2)+5 ≈ 12 for
    #    10 MB docs, so at the reference's default threshold of 50 the
    #    recall pass always wins (observable contract of the reference,
    #    see config.py) and parsing twice would only burn CPU.
    title, out, ok, err = None, [], False, None
    a1_bound = (
        math.log10(cfg.max_html_bytes + 1)
        * (cfg.text_length_weight + cfg.word_count_weight)
        + cfg.title_bonus
    )
    if cfg.score_threshold <= a1_bound:
        title, out, ok, err = _html_pass(ordered, PRECISION)
        if ok:
            score = scoring.quality_score(title, _rendered_text(out))
            if score >= cfg.score_threshold:
                return DocResult(
                    doc_id, title, ENGINE_PRECISION, score, True, None, ssr_flag, out
                )

    # 3. Recall pass (the "Readability fallback").
    title2, out2, ok2, err2 = _html_pass(ordered, RECALL)
    if ok2:
        score2 = scoring.readability_score(_rendered_text(out2))
        return DocResult(
            doc_id, title2 or title, ENGINE_RECALL, score2, True, None, ssr_flag, out2
        )

    return DocResult(
        doc_id, title or title2, ENGINE_RECALL, 0.0, False,
        err2 or err or "extraction failed", ssr_flag, [],
    )
