"""Pure-Python PNG codec (stdlib zlib only) — the REAL image-decode
path for the multimodal operators.

No image library ships in this container, but PNG needs nothing beyond
zlib: chunk walk → IHDR geometry → concatenated-IDAT inflate →
per-scanline filter reversal (types 0-4, the full spec set) → pixels.
Supported: 8-bit grayscale (color type 0) and 8-bit RGB (color type 2),
non-interlaced — which covers everything synthesize_png produces and
the common thumbnail case. Other color types / bit depths / interlace
raise NotImplementedError so callers can fall back (and say so in
decode_ok) instead of mis-decoding.

encode_png exists so tests and synthetic media tables carry REAL
decodable payloads — no external fixture data.

PNG is a public spec (RFC 2083); this is an independent minimal
implementation.
"""

from __future__ import annotations

import math
import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: list[list[int]]) -> bytes:
    """8-bit grayscale PNG from a row-major pixel matrix (filter 0)."""
    height = len(pixels)
    width = len(pixels[0]) if height else 0
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(row) for row in pixels)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def is_png(payload: bytes) -> bool:
    return payload[:8] == _PNG_SIG


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """PNG → (width, height, channels, unfiltered pixel bytes).

    Raises ValueError on a malformed file and NotImplementedError on a
    valid-but-unsupported variant (palette/alpha/16-bit/interlaced)."""
    if not is_png(payload):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    channels = 0
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise ValueError("truncated chunk")
        if tag == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color not in (0, 2) or interlace != 0:
                raise NotImplementedError(
                    f"unsupported PNG variant: depth={depth} color={color} interlace={interlace}"
                )
            channels = 1 if color == 0 else 3
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("bad decompressed length")
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return width, height, channels, bytes(out)


def _lum_histogram(
    width: int, height: int, channels: int, pixels: bytes, dim: int
) -> list[float]:
    buckets = [0] * dim
    n = width * height
    if channels == 1:
        for v in pixels:
            buckets[v * dim // 256] += 1
    else:
        for i in range(0, len(pixels), 3):
            lum = (299 * pixels[i] + 587 * pixels[i + 1] + 114 * pixels[i + 2]) // 1000
            buckets[lum * dim // 256] += 1
    return [round(c / n, 6) for c in buckets]


def luminance_histogram(payload: bytes, dim: int = 16) -> list[float]:
    """REAL image feature: decode the PNG and bucket pixel luminance
    (ITU-R 601 weights for RGB) into `dim` bins, L1-normalized."""
    return _lum_histogram(*decode_png(payload), dim)


def image_luminance_histogram(payload: bytes, dim: int = 16) -> list[float]:
    """Format-dispatching luminance feature: PNG (chunk-walk codec
    above) or baseline JPEG (core/jpegcodec.py huffman+IDCT decoder).
    Raises ValueError on other formats, NotImplementedError on
    unsupported variants — the multimodal fallback ladder's contract."""
    from .jpegcodec import decode_jpeg, is_jpeg

    if is_png(payload):
        return _lum_histogram(*decode_png(payload), dim)
    if is_jpeg(payload):
        return _lum_histogram(*decode_jpeg(payload), dim)
    raise ValueError("not a PNG or JPEG payload")


def _lum_plane(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Grayscale luminance plane (ITU-R 601 integer weights for RGB —
    the same arithmetic _lum_histogram and resize_png use)."""
    if channels == 1:
        return pixels
    gray = bytearray(width * height)
    for i in range(width * height):
        j = 3 * i
        gray[i] = (
            299 * pixels[j] + 587 * pixels[j + 1] + 114 * pixels[j + 2]
        ) // 1000
    return bytes(gray)


def _decoded_lum(payload: bytes) -> tuple[int, int, bytes]:
    """(width, height, luminance plane) via the PNG/JPEG dispatch —
    the one decode both perceptual hashes share."""
    from .jpegcodec import decode_jpeg, is_jpeg

    if is_png(payload):
        w, h, ch, px = decode_png(payload)
    elif is_jpeg(payload):
        w, h, ch, px = decode_jpeg(payload)
    else:
        raise ValueError("not a PNG or JPEG payload")
    return w, h, _lum_plane(w, h, ch, px)


def perceptual_hashes(payload: bytes) -> tuple[int, int]:
    """(dhash64, ahash64) from ONE decode — what the scan-side batch
    operator calls; decoding is the dominant cost, the grid passes are
    noise."""
    w, h, lum = _decoded_lum(payload)
    return (
        _dhash_from_plane(w, h, lum),
        _ahash_from_plane(w, h, lum),
    )


def dhash64(payload: bytes, grid_w: int = 9, grid_h: int = 8) -> int:
    """Perceptual difference hash (dHash): decode (PNG chunk walk or
    baseline JPEG huffman+IDCT — the repo's own codecs), take the
    luminance plane, nearest-neighbor sample to a grid_w × grid_h grid
    (sx = x·w//grid_w, sy = y·h//grid_h — the resize_png sampling
    rule), and emit one bit per horizontal gradient: bit(y,x) = 1 iff
    g[y][x] < g[y][x+1]. Default 9×8 ⇒ 64 bits, returned as a SIGNED
    64-bit int (bit index y·(grid_w−1)+x; two's complement, so the
    value round-trips through a Spark/parquet LongType). Near-visual
    duplicates — re-encodes, mild recompression, small crops — land
    within a few bits of Hamming distance; operators/imagededup.py
    does the banded pair search. Honest boundary: a bit whose two
    samples are exactly EQUAL (large perfectly flat regions) has zero
    margin, so lossy re-encode noise flips it coin-wise — inherent to
    comparison hashing; production stacks pair dHash with a DCT pHash
    for flat-heavy corpora. Raises like the underlying decoders on
    non-image / unsupported payloads (the fallback-ladder contract)."""
    w, h, lum = _decoded_lum(payload)
    return _dhash_from_plane(w, h, lum, grid_w, grid_h)


def _dhash_from_plane(
    w: int, h: int, lum: bytes, grid_w: int = 9, grid_h: int = 8
) -> int:
    if w < grid_w or h < grid_h:
        raise ValueError("image smaller than the hash grid")
    bits_per_row = grid_w - 1
    acc = 0
    for y in range(grid_h):
        row_base = (y * h // grid_h) * w
        prev = lum[row_base]
        for x in range(bits_per_row):
            nxt = lum[row_base + ((x + 1) * w // grid_w)]
            if prev < nxt:
                acc |= 1 << (y * bits_per_row + x)
            prev = nxt
    n_bits = bits_per_row * grid_h
    if acc >= 1 << (n_bits - 1):
        acc -= 1 << n_bits
    return acc


def ahash64(payload: bytes, grid: int = 8) -> int:
    """Perceptual average hash (aHash): decode, sample the luminance
    plane to a grid × grid cell array (the dhash64 nearest-neighbor
    rule), and set bit y·grid+x iff the cell EXCEEDS the integer mean
    (sum // cells, floor — exact, so the DuckDB oracle reproduces it).
    Complements dhash64: dHash keys on local gradients (weak where a
    re-encode jitters exact ties in flat regions), aHash keys on the
    global light/dark layout (stable on flat-heavy meme-style images,
    weak on uniform gradients where every cell hugs the mean) — the
    standard production pairing. Same signed-64-bit packing and the
    same Hamming-LSH pair search (operators/imagededup.py,
    hash_col='ahash')."""
    w, h, lum = _decoded_lum(payload)
    return _ahash_from_plane(w, h, lum, grid)


def _ahash_from_plane(w: int, h: int, lum: bytes, grid: int = 8) -> int:
    if w < grid or h < grid:
        raise ValueError("image smaller than the hash grid")
    cells = [
        lum[(y * h // grid) * w + (x * w // grid)]
        for y in range(grid)
        for x in range(grid)
    ]
    mean = sum(cells) // len(cells)
    acc = 0
    for i, v in enumerate(cells):
        if v > mean:
            acc |= 1 << i
    n_bits = grid * grid
    if acc >= 1 << (n_bits - 1):
        acc -= 1 << n_bits
    return acc


PDCT_N = 32  # input grid: 32×32 luminance samples (classic pHash)
PDCT_SCALE = 16384  # 2^14 fixed-point cosine scale

# Fixed-point DCT-II basis, C[k][n] = round(cos(π·(2n+1)·k / 2N) · 2^14),
# generated ONCE here and shared verbatim with the DuckDB oracle (the
# integers are injected into the SQL as literals), so both engines run
# the SAME exact integer matrix multiply — no cross-engine libm in the
# hash path. Only rows k < 8 are ever used (the low-frequency block).
PDCT_COS = [
    [
        round(math.cos(math.pi * (2 * n + 1) * k / (2 * PDCT_N)) * PDCT_SCALE)
        for n in range(PDCT_N)
    ]
    for k in range(8)
]


def pdct64(payload: bytes) -> int:
    """DCT-based perceptual hash (pHash), fixed-point integer DCT-II —
    the third member of the perceptual family and the one that holds
    where dHash's zero-margin ties flip (lossy re-encode noise in flat
    regions is HIGH-frequency; the 8×8 low-frequency block barely
    moves, and the median threshold gives every bit real margin).

    Pipeline (all exact integer arithmetic, so the DuckDB oracle
    reproduces it bit-for-bit): decode → luminance → nearest-neighbor
    sample to a 32×32 grid → separable integer DCT-II (rows then
    columns with the PDCT_COS table) → keep the 8×8 low-frequency
    block, drop DC → bit i = 1 iff coefficient i exceeds the MEDIAN of
    the 63 AC coefficients (63 is odd ⇒ the median is the 32nd
    smallest, unambiguous). 63 data bits packed little-endian in a
    signed 64-bit int (bit 63 always 0); same Hamming-LSH band search
    as dhash64/ahash64 (operators/imagededup.py, hash_col='pdct').
    Raises like the underlying decoders on unsupported payloads."""
    w, h, lum = _decoded_lum(payload)
    return _pdct_from_plane(w, h, lum)


def _pdct_from_plane(w: int, h: int, lum: bytes) -> int:
    n = PDCT_N
    if w < n or h < n:
        raise ValueError("image smaller than the hash grid")
    grid = [
        [lum[(y * h // n) * w + (x * w // n)] for x in range(n)]
        for y in range(n)
    ]
    # separable DCT: only the first 8 frequency rows/cols are kept, so
    # stage 1 computes 8×32 sums and stage 2 the 8×8 block — ~16k
    # integer multiply-adds per image, noise next to the decode
    t1 = [
        [sum(PDCT_COS[k][y] * grid[y][x] for y in range(n)) for x in range(n)]
        for k in range(8)
    ]
    coef = [
        sum(PDCT_COS[l][x] * t1[k][x] for x in range(n))
        for k in range(8)
        for l in range(8)
    ]
    ac = coef[1:]  # drop DC — it only encodes global brightness
    med = sorted(ac)[31]
    acc = 0
    for i, c in enumerate(ac):
        if c > med:
            acc |= 1 << i
    return acc  # bit 63 unused ⇒ always a non-negative signed 64-bit


def resize_png(payload: bytes, out_w: int, out_h: int) -> bytes:
    """REAL nearest-neighbor resize: decode → sample → re-encode
    (grayscale output; RGB inputs are luminance-converted first — the
    thumbnail use case for training-data pipelines). Raises like
    decode_png on unsupported inputs."""
    width, height, channels, pixels = decode_png(payload)
    if channels == 3:
        gray = bytearray(width * height)
        for i in range(width * height):
            j = 3 * i
            gray[i] = (
                299 * pixels[j] + 587 * pixels[j + 1] + 114 * pixels[j + 2]
            ) // 1000
        pixels = bytes(gray)
    rows = []
    for y in range(out_h):
        sy = y * height // out_h
        base = sy * width
        rows.append([pixels[base + (x * width // out_w)] for x in range(out_w)])
    return encode_png(rows)


def jpeg_dimensions(payload: bytes) -> tuple[int, int]:
    """JPEG SOF scan for (width, height) — header-only, no pixel path
    (a full JPEG entropy decode is out of scope without a codec lib)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        # the spec allows any number of 0xFF fill bytes before a marker
        while pos + 4 <= len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(payload):
            break
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if seglen < 2:  # zero-progress guard on corrupt input
            raise ValueError("bad JPEG segment length")
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):  # SOFn
            height, width = struct.unpack(">HH", payload[pos + 5 : pos + 9])
            return width, height
        pos += 2 + seglen
    raise ValueError("no SOF marker")
