"""PDF layout-parse tests: the decode is stubbed, but reading order,
column detection, furniture removal, and paragraph assembly are real
logic verified on synthetic block sets."""

from __future__ import annotations

import base64

from claude_readability_hook_spark.core.extractor import extract_document
from claude_readability_hook_spark.core.pdflayout import (
    Block,
    assemble_text,
    detect_columns,
    pdf_to_text,
    reading_order,
    strip_running_furniture,
)


def test_two_column_reading_order():
    blocks = [
        Block(0, 310, 40, 560, 140, "RIGHT top"),
        Block(0, 40, 160, 290, 260, "LEFT bottom"),
        Block(0, 40, 40, 290, 140, "LEFT top"),
        Block(0, 310, 160, 560, 260, "RIGHT bottom"),
    ]
    ordered = [b.text for b in reading_order(blocks)]
    assert ordered == ["LEFT top", "LEFT bottom", "RIGHT top", "RIGHT bottom"]


def test_detect_columns_merges_overlaps():
    blocks = [
        Block(0, 40, 0, 290, 10, "a"),
        Block(0, 60, 20, 280, 30, "b"),  # overlaps column 1
        Block(0, 310, 0, 560, 10, "c"),
    ]
    cols = detect_columns(blocks)
    assert len(cols) == 2


def test_running_headers_and_page_numbers_stripped():
    blocks = []
    for page in range(3):
        blocks.append(Block(page, 40, 10, 560, 20, "Journal of Examples", 8.0))
        blocks.append(Block(page, 40, 100, 560, 200, f"Body text page {page}"))
        blocks.append(Block(page, 280, 780, 320, 790, str(page + 1)))
    kept = [b.text for b in strip_running_furniture(blocks)]
    assert all("Journal" not in t for t in kept)
    assert all(not t.strip().isdigit() for t in kept)
    assert len(kept) == 3


def test_paragraph_assembly_gap_and_font_boundaries():
    blocks = [
        Block(0, 40, 40, 560, 60, "Heading", font_size=16.0),
        Block(0, 40, 70, 560, 90, "first line of body"),
        Block(0, 40, 92, 560, 112, "second line continues"),
        Block(0, 40, 200, 560, 220, "new paragraph after gap"),
    ]
    text = assemble_text(blocks)
    paras = text.split("\n\n")
    assert paras[0] == "Heading"
    assert paras[1] == "first line of body second line continues"
    assert paras[2] == "new paragraph after gap"


def test_pdf_to_text_stubbed_end_to_end():
    text, status = pdf_to_text(b"\x02fake pdf payload bytes")
    assert status == "stubbed"
    assert "Running Header" not in text  # furniture stripped
    assert "p0 c0 r0" in text
    # left column before right column on each page
    assert text.index("p0 c0 r0") < text.index("p0 c1 r0")


def test_pdf_span_through_extractor():
    payload = base64.b64encode(b"\x01binary-ish pdf bytes").decode()
    spans = [
        {"kind": "pdf", "text": payload, "media_ref": "", "offset": 0},
        {"kind": "media", "text": "", "media_ref": "img:9", "offset": 1},
    ]
    r = extract_document("pdfdoc", spans)
    assert r.success
    kinds = [s["kind"] for s in r.spans]
    assert kinds == ["text", "media"]
    assert "c0 r0" in r.spans[0]["text"]
    assert r.spans[1]["media_ref"] == "img:9"


def test_dct_image_lift_decodes_real_jpeg():
    """A /Subtype /Image DCTDecode XObject routes through the JPEG
    decoder: exact dims + mean luminance (flat field, unit quant →
    exact round trip), document text decode stays 'ok'."""
    from claude_readability_hook_spark.core.pdflayout import (
        decode_pdf_full,
        synthesize_pdf,
    )

    px = [[137] * 16 for _ in range(16)]
    payload = synthesize_pdf(
        [[(40, 100, 10, "text with a figure.")]], images=[px]
    )
    blocks, images, status = decode_pdf_full(payload)
    assert status == "ok" and blocks
    [im] = images
    assert (im["width"], im["height"], im["mean_lum"], im["status"]) == (
        16, 16, 137, "ok",
    )


def test_unsupported_image_filter_does_not_poison_text():
    """A JPX image degrades to a per-image 'stubbed' record; before the
    lift, the unknown filter flipped the WHOLE document to the
    synthetic fallback."""
    from claude_readability_hook_spark.core.pdflayout import (
        decode_pdf_full,
        synthesize_pdf,
    )

    payload = synthesize_pdf([[(40, 100, 10, "real text survives.")]])
    jpx = (
        b"<< /Subtype /Image /Width 4 /Height 4 /Filter /JPXDecode"
        b" /Length 6 >>\nstream\nXXXXXX\nendstream\n"
    )
    payload = payload.replace(b"%%EOF\n", jpx + b"%%EOF\n")
    blocks, images, status = decode_pdf_full(payload)
    assert status == "ok"
    assert any("real text survives" in b.text for b in blocks)
    assert images[0]["status"] == "stubbed"


def test_extractor_emits_media_span_for_lifted_pdf_image():
    from claude_readability_hook_spark.core.extractor import extract_document
    from claude_readability_hook_spark.core.pdflayout import synthesize_pdf
    import base64

    payload = synthesize_pdf(
        [[(40, 100, 10, "Pdf paragraph with enough characters.")]],
        compress=True,
        images=[[[10] * 16 for _ in range(16)]],
    )
    res = extract_document(
        "x",
        [{"kind": "pdf", "text": base64.b64encode(payload).decode(),
          "media_ref": "", "offset": 0}],
    )
    assert res.success
    assert [(s["kind"], s["media_ref"]) for s in res.spans] == [
        ("text", ""), ("media", "pdfimg:0"),
    ]
