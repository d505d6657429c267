"""PDF / layout parsing for kind='pdf' spans (north_rule: "HTML
boilerplate strip, PDF/layout parse, DOM heuristics").

Decode has a REAL path for uncompressed PDFs (`_decode_pdf`: content
streams → Tm/Td/Tf/Tj text operators → positioned blocks; status
'ok'), built with no PDF library — none ships in this container.
Compressed/exotic PDFs and non-PDF payloads fall back to a
deterministic synthetic layout (status 'stubbed') so the pipeline is
exercised end-to-end either way. Everything downstream of decode is
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


_STREAM_RE = None  # compiled lazily below


def _decode_image_xobject(hdr: bytes, body: bytes) -> dict:
    """Lift an embedded /Subtype /Image XObject. DCTDecode streams ARE
    baseline/progressive JPEGs, and the repo carries a full JPEG
    decoder (core/jpegcodec) — route them through it instead of
    poisoning the whole document's decode (the r4 'what's missing #5'
    connection between the two decode ladders). FlateDecode 8-bit
    DeviceGray raw bitmaps decode via zlib. ASCII armor ahead of the
    image filter is unwrapped like the text chain. Anything else
    (JPX, CCITT, JBIG2…) degrades to a per-IMAGE 'stubbed' record —
    the document's text decode stays 'ok'."""
    import base64
    import binascii
    import re
    import zlib

    def dim(name: bytes) -> int | None:
        m = re.search(rb"/" + name + rb"\s+(\d+)", hdr)
        return int(m.group(1)) if m else None

    w, h = dim(b"Width"), dim(b"Height")
    rec = {"width": w, "height": h, "mean_lum": None, "status": "stubbed"}
    filt = re.search(rb"/Filter\s*(/\w+|\[[^\]]*\])", hdr)
    names = re.findall(rb"/(\w+)", filt.group(1)) if filt else []
    try:
        for name in names[:-1]:  # armor ahead of the image codec
            if name == b"ASCIIHexDecode":
                data = b"".join(body.split())
                eod = data.find(b">")
                if eod != -1:
                    data = data[:eod]
                if len(data) % 2:
                    data += b"0"
                body = binascii.unhexlify(data)
            elif name == b"ASCII85Decode":
                data = b"".join(body.split())
                if data.endswith(b"~>"):
                    data = data[:-2]
                body = base64.a85decode(data)
            else:
                return rec
        last = names[-1] if names else None
        if last == b"DCTDecode":
            from .jpegcodec import decode_jpeg

            jw, jh, _ch, raw = decode_jpeg(body)
            rec.update(
                width=jw,
                height=jh,
                mean_lum=sum(raw) // len(raw) if raw else 0,
                status="ok",
            )
        elif last == b"FlateDecode" and b"/DeviceGray" in hdr and w and h:
            raw = zlib.decompress(body)
            if len(raw) < w * h:
                raise ValueError("short image data")
            raw = raw[: w * h]
            rec.update(mean_lum=sum(raw) // len(raw), status="ok")
        return rec
    except NotImplementedError:
        return rec  # codec scope boundary → stubbed, not poisoned
    except Exception as exc:  # noqa: BLE001 — per-image poison isolation
        rec["status"] = f"error: {type(exc).__name__}"
        return rec


def _decode_pdf(payload: bytes, images: list[dict] | None = None) -> list[Block]:
    """REAL decode for uncompressed PDFs: walk the content streams and
    interpret the text operators — `Tm`/`Td` (position), `Tf` (font
    size), `Tj` (show string) — emitting one positioned Block per shown
    string. Page index = content-stream order; PDF user space grows
    upward, Block y grows downward, so y0 = page_height − Ty.

    Scope is deliberately minimal-but-real: FlateDecode streams inflate
    via stdlib zlib (the same inflater the PNG codec's IDAT path uses —
    FlateDecode covers the overwhelming majority of real-world PDF
    content streams), and /Filter may be a NAME or an ARRAY chaining
    ASCIIHexDecode / ASCII85Decode ahead of Flate, plus LZWDecode
    (TIFF-convention, EarlyChange=1) and RunLengthDecode (r3 item 6 —
    `[/FlateDecode]` single-element arrays and ASCII-armored Flate are
    the next-most-common real-corpus shapes). Filters the chain does
    not know (DCT, JBIG2, CCITT…) still raise
    NotImplementedError so decode_pdf falls back. No font metrics —
    width is approximated from the string length × font size."""
    import re
    import zlib

    if not payload.startswith(b"%PDF-"):
        raise NotImplementedError("not a PDF payload")
    global _STREAM_RE
    if _STREAM_RE is None:
        _STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.DOTALL)
    page_height = 792.0  # US Letter default MediaBox
    blocks: list[Block] = []
    page = -1

    # Walk (header, stream body) pairs. The body is sliced by the
    # header's /Length when present — a compressed body may legally
    # contain the byte sequence 'endstream', so scanning for the
    # keyword alone would truncate it; /Length is authoritative.
    def _streams():
        pos = 0
        while True:
            sm = _STREAM_RE.search(payload, pos)
            if sm is None:
                return
            hdr_b = sm.group(1)
            body_start = sm.end()
            lm = re.search(rb"/Length\s+(\d+)", hdr_b)
            if lm is not None:
                n = int(lm.group(1))
                body_b = payload[body_start : body_start + n]
                end = payload.find(b"endstream", body_start + n)
                pos = (end + len(b"endstream")) if end != -1 else body_start + n
            else:
                end = payload.find(b"endstream", body_start)
                if end == -1:
                    return
                body_b = payload[body_start:end]
                pos = end + len(b"endstream")
            yield hdr_b, body_b

    for hdr, body in _streams():
        if re.search(rb"/Subtype\s*/Image", hdr):
            # image XObject: lift it (or degrade per-image) and keep
            # walking — an embedded image must not flip the document's
            # TEXT decode to the stubbed path
            if images is not None:
                images.append(_decode_image_xobject(hdr, body))
            continue
        if b"/Filter" in hdr:
            filt = re.search(rb"/Filter\s*(/\w+|\[[^\]]*\])", hdr)
            if filt is None:
                raise NotImplementedError("unparseable /Filter value")
            # name or array → ordered filter chain (array order IS
            # decode order per the PDF spec)
            for name in re.findall(rb"/(\w+)", filt.group(1)):
                if name == b"FlateDecode":
                    # decompressobj tolerates the spec-legal EOL bytes
                    # between the deflate data's end and 'endstream'
                    try:
                        d = zlib.decompressobj()
                        body = d.decompress(body) + d.flush()
                    except zlib.error as exc:
                        raise ValueError(f"bad FlateDecode stream: {exc}") from exc
                elif name == b"ASCIIHexDecode":
                    data = b"".join(body.split())
                    eod = data.find(b">")
                    if eod != -1:
                        data = data[:eod]
                    if len(data) % 2:  # odd final digit: implicit 0
                        data += b"0"
                    try:
                        body = bytes.fromhex(data.decode("latin-1"))
                    except ValueError as exc:
                        raise ValueError(f"bad ASCIIHex stream: {exc}") from exc
                elif name == b"ASCII85Decode":
                    import base64

                    data = b"".join(body.split())
                    if data.endswith(b"~>"):
                        data = data[:-2]
                    try:
                        body = base64.a85decode(data)
                    except ValueError as exc:
                        raise ValueError(f"bad ASCII85 stream: {exc}") from exc
                elif name == b"LZWDecode":
                    if b"/EarlyChange 0" in hdr:
                        raise NotImplementedError("LZW EarlyChange 0")
                    body = _lzw_decode(body)
                elif name == b"RunLengthDecode":
                    # PDF 7.4.5: L ≤ 127 → copy L+1 literal bytes;
                    # L ≥ 129 → repeat next byte 257−L times; 128 = EOD
                    out = bytearray()
                    i = 0
                    while i < len(body):
                        L = body[i]
                        if L == 128:
                            break
                        if L < 128:
                            chunk = body[i + 1 : i + 2 + L]
                            if len(chunk) != L + 1:
                                raise ValueError("truncated RunLength literal")
                            out += chunk
                            i += 2 + L
                        else:
                            if i + 1 >= len(body):
                                raise ValueError("truncated RunLength run")
                            out += bytes([body[i + 1]]) * (257 - L)
                            i += 2
                    body = bytes(out)
                else:
                    raise NotImplementedError(
                        f"unsupported PDF stream filter /{name.decode('latin-1')}"
                    )
        if b"BT" not in body:
            continue
        page += 1
        x = y = 0.0
        size = 10.0
        for op in re.finditer(
            rb"(?:(-?[\d.]+)\s+(-?[\d.]+)\s+(Td|TD)"
            rb"|(-?[\d.]+)\s+(-?[\d.]+)\s+(-?[\d.]+)\s+(-?[\d.]+)\s+(-?[\d.]+)\s+(-?[\d.]+)\s+Tm"
            rb"|/\w+\s+(-?[\d.]+)\s+Tf"
            rb"|\(((?:[^()\\]|\\.)*)\)\s*Tj)",
            body,
        ):
            g = op.groups()
            # group layout: 0-2 Td/TD, 3-8 Tm, 9 Tf, 10 Tj
            if g[2] is not None:  # Td/TD — relative move
                x += float(g[0])
                y += float(g[1])
            elif g[3] is not None:  # Tm — absolute matrix (e f = origin)
                x, y = float(g[7]), float(g[8])
            elif g[9] is not None:  # Tf
                size = float(g[9])
            elif g[10] is not None:  # Tj
                text = (
                    g[10]
                    .replace(rb"\(", b"(")
                    .replace(rb"\)", b")")
                    .replace(rb"\\", b"\\")
                    .decode("latin-1")
                )
                if text.strip():
                    y0 = page_height - y
                    blocks.append(
                        Block(page, x, y0, x + 0.5 * size * len(text), y0 + size, text, size)
                    )
    if page < 0:
        raise NotImplementedError("no text content streams found")
    return blocks


def _lzw_decode(data: bytes) -> bytes:
    """PDF 7.4.4 LZWDecode (TIFF-convention LZW): variable code width
    9→12 bits MSB-first, Clear=256, EOD=257, EarlyChange=1 (the
    default — the width bumps one code EARLY, at table sizes 511/1023/
    2047). Pure stdlib; malformed streams raise ValueError."""
    CLEAR, EOD = 256, 257
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            nbits -= width
            code = (acc >> nbits) & ((1 << width) - 1)
            if code == CLEAR:
                table = table[:258]
                width = 9
                prev = None
                continue
            if code == EOD:
                return bytes(out)
            if code < len(table) and (code < 256 or code > 257):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]  # KwKwK case
            else:
                raise ValueError("bad LZW code")
            out += entry
            if prev is not None:
                table.append(prev + entry[:1])
            prev = entry
            # EarlyChange=1: grow width when the NEXT code would not fit
            if len(table) + 1 >= (1 << width) and width < 12:
                width += 1
    return bytes(out)  # EOD-less streams end with the data


def _lzw_encode(data: bytes) -> bytes:
    """Mirror encoder for _lzw_decode (tests/synthesize_pdf): emits
    Clear, the code stream with the decoder's exact width schedule
    (simulated decoder table length drives the 9→12 bumps), and EOD."""
    CLEAR, EOD = 256, 257
    bits: list[tuple[int, int]] = []
    width = 9
    sim_len = 258  # decoder-side table length, drives width bumps
    first_after_clear = True

    def emit(code: int) -> None:
        nonlocal width, sim_len, first_after_clear
        bits.append((code, width))
        if code == CLEAR:
            width = 9
            sim_len = 258
            first_after_clear = True
            return
        if not first_after_clear:
            sim_len += 1
        first_after_clear = False
        if sim_len + 1 >= (1 << width) and width < 12:
            width += 1

    emit(CLEAR)
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        w = bytes([ch])
        if next_code >= 4094:  # table nearly full: reset both sides
            emit(CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
    if w:
        emit(table[w])
    emit(EOD)
    out = bytearray()
    acc = nbits = 0
    for code, wd in bits:
        acc = (acc << wd) | code
        nbits += wd
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


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


def decode_pdf_full(payload: bytes) -> tuple[list[Block], list[dict], str]:
    """(blocks, images, status): like decode_pdf, plus the lifted
    /Subtype /Image records (stream order; see _decode_image_xobject).
    The stub/error fallbacks report no images."""
    images: list[dict] = []
    try:
        return _decode_pdf(payload, images), images, "ok"
    except NotImplementedError:
        return _fake_decode(payload), [], "stubbed"
    except Exception as exc:  # noqa: BLE001
        return [], [], f"decode error: {type(exc).__name__}"


def synthesize_pdf(
    pages: list[list[tuple[float, float, float, str]]],
    compress: bool = False,
    encoding: str | None = None,
    images: list[list[list[int]]] | None = None,
) -> bytes:
    """A REAL minimal PDF (tests/bench — no fixture data): one content
    stream per page, each item = (x, y_from_top, font_size, text).
    compress=True (or encoding='flate') emits FlateDecode content
    streams (zlib), the form the vast majority of real PDFs take; the
    other encodings cover the filter-chain shapes r3 flagged as
    rejected:

      'flate_array'  /Filter [/FlateDecode]           (1-element array)
      'ahx_flate'    /Filter [/ASCIIHexDecode /FlateDecode]
      'a85_flate'    /Filter [/ASCII85Decode /FlateDecode]
      'rle'          /Filter /RunLengthDecode (literal-run encoding)
      'lzw'          /Filter /LZWDecode (TIFF LZW, EarlyChange=1)

    (array order is DECODE order, so the encoder applies Flate first,
    then the ASCII armor.) Round-trips through _decode_pdf exactly in
    every mode.

    `images`: grayscale pixel matrices embedded as /Subtype /Image
    DCTDecode XObjects — REAL JPEG bytes (unit-quant, exact round
    trip) the image lift decodes back."""
    import base64
    import binascii
    import zlib

    if encoding is None:
        encoding = "flate" if compress else "plain"
    parts = [b"%PDF-1.4\n"]
    for items in pages:
        ops = [b"BT"]
        for x, y_top, size, text in items:
            esc = text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
            ops.append(f"/F1 {size:g} Tf".encode())
            ops.append(f"1 0 0 1 {x:g} {792 - y_top:g} Tm".encode())
            ops.append(b"(" + esc.encode("latin-1") + b") Tj")
        ops.append(b"ET")
        body = b"\n".join(ops)
        if encoding == "plain":
            filter_tag = b""
        elif encoding == "flate":
            body = zlib.compress(body)
            filter_tag = b" /Filter /FlateDecode"
        elif encoding == "flate_array":
            body = zlib.compress(body)
            filter_tag = b" /Filter [/FlateDecode]"
        elif encoding == "ahx_flate":
            body = binascii.hexlify(zlib.compress(body)) + b">"
            filter_tag = b" /Filter [/ASCIIHexDecode /FlateDecode]"
        elif encoding == "a85_flate":
            body = base64.a85encode(zlib.compress(body)) + b"~>"
            filter_tag = b" /Filter [/ASCII85Decode /FlateDecode]"
        elif encoding == "lzw":
            body = _lzw_encode(body)
            filter_tag = b" /Filter /LZWDecode"
        elif encoding == "rle":
            # naive literal-run RLE (always valid, rarely compressive)
            out = bytearray()
            for i in range(0, len(body), 127):
                chunk = body[i : i + 127]
                out += bytes([len(chunk) - 1]) + chunk
            out.append(128)  # EOD
            body = bytes(out)
            filter_tag = b" /Filter /RunLengthDecode"
        else:
            raise ValueError(f"unknown encoding {encoding!r}")
        parts.append(
            b"<< /Length "
            + str(len(body)).encode()
            + filter_tag
            + b" >>\nstream\n"
            + body
            + b"\nendstream\n"
        )
    for px in images or []:
        from .jpegcodec import encode_jpeg_gray

        jp = encode_jpeg_gray(px, quant=[1] * 64)
        parts.append(
            b"<< /Subtype /Image /Width "
            + str(len(px[0])).encode()
            + b" /Height "
            + str(len(px)).encode()
            + b" /ColorSpace /DeviceGray /BitsPerComponent 8"
            + b" /Filter /DCTDecode /Length "
            + str(len(jp)).encode()
            + b" >>\nstream\n"
            + jp
            + b"\nendstream\n"
        )
    parts.append(b"%%EOF\n")
    return b"".join(parts)


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
    text, _images, status = pdf_to_content(payload)
    return text, status


def pdf_to_content(payload: bytes) -> tuple[str, list[dict], str]:
    """payload → (extracted text, lifted images, decode status) — the
    extractor's entry: text through the layout pass, embedded images
    through the JPEG/Flate lift (connecting the PDF and image decode
    ladders; the extractor emits each 'ok' image as a media span)."""
    blocks, images, status = decode_pdf_full(payload)
    if not blocks:
        return "", images, status
    cleaned = strip_running_furniture(blocks)
    ordered = reading_order(cleaned)
    return assemble_text(ordered), images, status
