"""PDF / layout parsing for kind='pdf' spans (north_rule: "HTML
boilerplate strip, PDF/layout parse, DOM heuristics").

The byte-level PDF decoder is STUBBED — no PDF library ships in this
container (pdfminer/pypdf/mupdf absent); `_decode_pdf` raises
NotImplementedError and a deterministic fake stands in so the pipeline
is exercised end-to-end. Everything downstream of decode is REAL
layout logic over positioned text blocks and carries the actual
heuristics a layout parse needs:

  - reading order: per page, cluster blocks into columns by x-overlap,
    then read columns left→right, blocks top→bottom
  - running header/footer removal: texts recurring on ≥3 pages within
    a y-band are furniture, not content
  - paragraph assembly: consecutive blocks merge unless separated by a
    large vertical gap or a font-size change (heading boundary)
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass


@dataclass(frozen=True)
class Block:
    page: int
    x0: float
    y0: float  # top (y grows downward)
    x1: float
    y1: float
    text: str
    font_size: float = 10.0


def _decode_pdf(payload: bytes) -> list[Block]:
    """STUB — a real implementation needs a PDF library (pdfminer /
    pypdf / mupdf), none of which are in this container. Swap the body,
    keep the signature (payload → positioned text blocks)."""
    raise NotImplementedError("PDF decode requires a PDF library; not in container")


def _fake_decode(payload: bytes) -> list[Block]:
    """Deterministic placeholder decode: derives a plausible 2-column,
    multi-page block layout from the payload bytes so the REAL layout
    code below is fully exercised."""
    if not payload:
        return []
    n_pages = payload[0] % 3 + 1
    blocks: list[Block] = []
    for page in range(n_pages):
        blocks.append(
            Block(page, 40, 10, 560, 20, "Running Header Journal of Examples", 8.0)
        )
        for col, x0 in ((0, 40.0), (1, 310.0)):
            for row in range(2):
                seed = payload[(page * 7 + col * 3 + row) % len(payload)]
                words = " ".join(f"w{(seed + k) % 97}" for k in range(12))
                y0 = 40.0 + row * 120.0
                blocks.append(
                    Block(page, x0, y0, x0 + 250.0, y0 + 100.0, f"p{page} c{col} r{row}: {words}.")
                )
        blocks.append(Block(page, 280, 780, 320, 790, str(page + 1), 8.0))  # page number
    return blocks


def decode_pdf(payload: bytes) -> tuple[list[Block], str]:
    """(blocks, status) with poison isolation; status ∈ ok|stubbed|error."""
    try:
        return _decode_pdf(payload), "ok"
    except NotImplementedError:
        return _fake_decode(payload), "stubbed"
    except Exception as exc:  # noqa: BLE001
        return [], f"decode error: {type(exc).__name__}"


# ---------------------------------------------------------------------------
# Real layout logic (unit-tested on synthetic block sets)
# ---------------------------------------------------------------------------


def strip_running_furniture(blocks: list[Block], min_pages: int = 3) -> list[Block]:
    """Remove running headers/footers/page numbers: texts that recur on
    >= min_pages pages within a narrow y-band, and bare page numbers."""
    n_pages = len({b.page for b in blocks})
    recur = Counter((b.text, round(b.y0 / 30)) for b in blocks)
    out = []
    for b in blocks:
        if n_pages >= min_pages and recur[(b.text, round(b.y0 / 30))] >= min_pages:
            continue
        if b.text.strip().isdigit() and len(b.text.strip()) <= 4:
            continue  # bare page number
        out.append(b)
    return out


def _column_of(block: Block, columns: list[tuple[float, float]]) -> int:
    for i, (x0, x1) in enumerate(columns):
        mid = (block.x0 + block.x1) / 2
        if x0 <= mid <= x1:
            return i
    return len(columns)


def detect_columns(blocks: list[Block]) -> list[tuple[float, float]]:
    """Cluster x-extents into columns: sort by x0 and split where a
    block starts right of the previous cluster's max x1."""
    if not blocks:
        return []
    spans = sorted((b.x0, b.x1) for b in blocks)
    columns = [list(spans[0])]
    for x0, x1 in spans[1:]:
        if x0 > columns[-1][1] - 5:  # negligible overlap ⇒ new column
            columns.append([x0, x1])
        else:
            columns[-1][1] = max(columns[-1][1], x1)
    return [(c[0], c[1]) for c in columns]


def reading_order(blocks: list[Block]) -> list[Block]:
    """Page → column (left→right) → y (top→down) → x."""
    out: list[Block] = []
    for page in sorted({b.page for b in blocks}):
        page_blocks = [b for b in blocks if b.page == page]
        columns = detect_columns(page_blocks)
        page_blocks.sort(
            key=lambda b: (_column_of(b, columns), b.y0, b.x0)
        )
        out.extend(page_blocks)
    return out


def assemble_text(blocks: list[Block], gap_threshold: float = 18.0) -> str:
    """Merge consecutive blocks into paragraphs; a large vertical gap or
    font-size change starts a new paragraph."""
    paras: list[str] = []
    current: list[str] = []
    prev: Block | None = None
    for b in blocks:
        text = " ".join(b.text.split())
        if not text:
            continue
        new_para = (
            prev is None
            or b.page != prev.page
            or b.font_size != prev.font_size
            or (b.y0 - prev.y1) > gap_threshold
            or b.x0 - prev.x0 > 50  # column jump
        )
        if new_para and current:
            paras.append(" ".join(current))
            current = []
        current.append(text)
        prev = b
    if current:
        paras.append(" ".join(current))
    return "\n\n".join(paras)


def pdf_to_text(payload: bytes) -> tuple[str, str]:
    """payload → (extracted text, decode status)."""
    blocks, status = decode_pdf(payload)
    if not blocks:
        return "", status
    cleaned = strip_running_furniture(blocks)
    ordered = reading_order(cleaned)
    return assemble_text(ordered), status
