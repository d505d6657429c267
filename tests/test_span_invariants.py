"""Property-based tests of the core span invariant: media_ref
placeholders survive extraction in original offset order, regardless of
input span ordering or surrounding content (the north_rule equality is
defined over (kind, text, media_ref, order))."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from claude_readability_hook_spark.core.extractor import extract_document

_words = st.lists(
    st.sampled_from("alpha beta gamma delta epsilon words content, more".split()),
    min_size=6,
    max_size=18,
)


@st.composite
def span_lists(draw):
    n = draw(st.integers(1, 7))
    spans = []
    media_idx = 0
    for offset in range(n):
        kind = draw(st.sampled_from(["text", "media", "html", "code"]))
        if kind == "text":
            spans.append(
                {"kind": "text", "text": " ".join(draw(_words)) + ".",
                 "media_ref": "", "offset": offset}
            )
        elif kind == "media":
            spans.append(
                {"kind": "media", "text": "", "media_ref": f"img:{media_idx}",
                 "offset": offset}
            )
            media_idx += 1
        elif kind == "code":
            spans.append(
                {"kind": "code", "text": "x = 1\ny = 2",
                 "media_ref": f"blk:{offset}", "offset": offset}
            )
        else:
            body = " ".join(draw(_words))
            spans.append(
                {"kind": "html",
                 "text": f"<article><p>{body}, and then some more text.</p></article>",
                 "media_ref": "", "offset": offset}
            )
    # deliver shuffled — the extractor must sort by offset itself
    order = draw(st.permutations(range(n)))
    return [spans[i] for i in order]


@settings(max_examples=120, deadline=None)
@given(span_lists())
def test_media_refs_preserved_in_offset_order(spans):
    result = extract_document("prop", spans)
    in_media = [
        s["media_ref"] for s in sorted(spans, key=lambda s: s["offset"])
        if s["kind"] == "media"
    ]
    out_media = [s["media_ref"] for s in result.spans if s["kind"] == "media"]
    assert out_media == in_media
    # offsets are a clean renumbering
    assert [s["offset"] for s in result.spans] == list(range(len(result.spans)))


@settings(max_examples=120, deadline=None)
@given(span_lists())
def test_code_spans_preserved_with_refs(spans):
    result = extract_document("prop", spans)
    in_code = [
        s["media_ref"] for s in sorted(spans, key=lambda s: s["offset"])
        if s["kind"] == "code"
    ]
    out_code = [s["media_ref"] for s in result.spans if s["kind"] == "code"]
    assert out_code == in_code


@settings(max_examples=60, deadline=None)
@given(span_lists())
def test_relative_order_of_kept_spans_is_monotone(spans):
    """Every surviving span must map to an input span at a non-decreasing
    original offset (no reordering across kinds)."""
    result = extract_document("prop", spans)
    ordered_in = sorted(spans, key=lambda s: s["offset"])
    # anchor positions: media/code refs are unique -> locate inputs
    anchors = [
        (i, s["media_ref"]) for i, s in enumerate(ordered_in) if s["media_ref"]
    ]
    anchor_rank = {ref: i for i, ref in anchors}
    ranks = [
        anchor_rank[s["media_ref"]] for s in result.spans if s["media_ref"]
    ]
    assert ranks == sorted(ranks)
