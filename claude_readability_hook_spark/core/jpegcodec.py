"""Pure-Python baseline-sequential JPEG codec (ITU-T T.81) — no codec
library in this container, so the entropy decode, dequantization, and
IDCT are implemented from the public spec (the huffman/quant tables
below are the spec's own Annex K examples).

Scope (honest): baseline DCT, 8-bit, Huffman; grayscale and 3-component
YCbCr with per-component sampling factors h,v ∈ {1..4} — 4:4:4, 4:2:2
and 4:2:0 chroma subsampling all decode (r3 ADVICE: the overwhelming
majority of real-world JPEGs are 4:2:0; a 1×1-only decoder effectively
covered synthesized fixtures only). Subsampled planes are decoded at
their stored resolution and box-replicated up to full resolution at the
YCbCr→RGB step. Restart markers supported. Progressive (SOF2),
arithmetic coding, and 12-bit raise NotImplementedError so callers fall
back — the same poison-isolation contract as the PNG codec.

The encoders (grayscale, and color with selectable 4:4:4/4:2:2/4:2:0
subsampling) exist so tests/bench can synthesize REAL JPEGs
deterministically with no fixture data; they share the canonical
huffman-code construction with the decoder, so an encode→decode
round-trip exercises both directions of the entropy coder, including
the interleaved multi-block MCU path.

Used by operators/multimodal.py for kind='image' JPEG payloads
(reference parity: the reference treats media as opaque URLs —
claude-readability-hook apps/extractor returns media_refs untouched —
so the decode ladder is beyond-reference capability for the
training-data pipeline)."""

from __future__ import annotations

import math
import struct

# --- public tables (ITU-T T.81 Annex K) ------------------------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

STD_LUM_QUANT = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

# (BITS[1..16], HUFFVAL) — Annex K.3 typical luminance tables
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

MAX_PIXELS = 1 << 24  # 16.7M px (≈4096×4096): decode-side poison guard
# progressive holds every component's full coefficient array across all
# scans (that is the format's design), so its guard is tighter
MAX_PIXELS_PROGRESSIVE = 1 << 22  # 4M px (≈2048×2048)

_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)] for u in range(8)
]
_C = [math.sqrt(0.5) if u == 0 else 1.0 for u in range(8)]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value → (code, length) by the canonical construction (T.81
    C.2): codes of each length assigned in HUFFVAL order."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → value for the decoder."""
    return {
        (length, code): v for v, (code, length) in _canonical_codes(bits, vals).items()
    }


# --- encoder (grayscale) ----------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-pad to byte boundary

    def raw_marker(self, marker: int) -> None:
        """Emit a real marker (no stuffing) — caller must align first."""
        self.out += bytes([0xFF, marker])

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _fdct(block: list[float]) -> list[float]:
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += block[x * 8 + y] * _COS[u][x] * _COS[v][y]
            out[u * 8 + v] = 0.25 * _C[u] * _C[v] * s
    return out


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, appended bits) for a DC diff / AC value."""
    if v == 0:
        return 0, 0
    size = v.bit_length() if v > 0 else (-v).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(
    bw: "_BitWriter",
    block: list[float],
    q: list[int],
    dc_codes: dict,
    ac_codes: dict,
    prev_dc: int,
) -> int:
    """FDCT + quantize + huffman-encode one level-shifted 8×8 block;
    returns the new DC predictor (shared by the gray and color
    encoders)."""
    coef = _fdct(block)
    zz = [int(round(coef[ZIGZAG[k]] / q[k])) for k in range(64)]
    diff = zz[0] - prev_dc
    size, bits = _magnitude(diff)
    code, length = dc_codes[size]
    bw.write(code, length)
    if size:
        bw.write(bits, size)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, 64):
        v = zz[k]
        if k > last_nz:
            code, length = ac_codes[0x00]  # EOB
            bw.write(code, length)
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | size]
        bw.write(code, length)
        bw.write(bits, size)
        run = 0
    return zz[0]


def _plane_block(plane: list[list[float]], by: int, bx: int) -> list[float]:
    """Edge-replicated 8×8 block starting at (by, bx)."""
    h = len(plane)
    w = len(plane[0])
    return [
        plane[min(by + i, h - 1)][min(bx + j, w - 1)]
        for i in range(8)
        for j in range(8)
    ]


def encode_jpeg_gray(
    pixels: list[list[int]],
    quant: list[int] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """rows of 0-255 luma → baseline single-component JFIF-less JPEG.
    quant defaults to the Annex K luminance table; pass [1]*64 for a
    near-lossless round-trip (DCT float rounding only). A nonzero
    restart_interval emits DRI + RSTn markers every N MCUs (exercises
    the decoder's restart/DC-reset path)."""
    q = quant or STD_LUM_QUANT
    h = len(pixels)
    w = len(pixels[0])
    dc_codes = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_codes = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    shifted = [[float(v - 128) for v in row] for row in pixels]
    bw = _BitWriter()
    prev_dc = 0
    mcu = 0
    n_rst = 0
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.align()
                bw.raw_marker(0xD0 + (n_rst % 8))
                n_rst += 1
                prev_dc = 0
            mcu += 1
            prev_dc = _encode_block(
                bw, _plane_block(shifted, by, bx), q, dc_codes, ac_codes, prev_dc
            )
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    dqt = seg(0xDB, b"\x00" + bytes(q[k] for k in range(64)))
    dri = seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht = seg(
        0xC4,
        b"\x00" + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS)
    ) + seg(0xC4, b"\x10" + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + dri + sof + dht + sos + scan + b"\xff\xd9"


def encode_jpeg_color(
    pixels: list[list[tuple[int, int, int]]],
    luma_sampling: tuple[int, int] = (2, 2),
    quant: list[int] | None = None,
) -> bytes:
    """rows of (r,g,b) → baseline 3-component YCbCr JPEG with chroma
    subsampling selected by the LUMA sampling factors: (1,1) = 4:4:4,
    (2,1) = 4:2:2, (2,2) = 4:2:0 (the real-world default). Chroma is
    box-averaged down by (sh, sv); all three components share the
    Annex-K luminance huffman tables (legal — the scan header just
    references table 0) and the given quant table. Exists so tests can
    synthesize REAL subsampled JPEGs deterministically — the decoder's
    4:2:0 path is then exercised by true interleaved multi-block MCUs,
    not hand-patched headers."""
    sh, sv = luma_sampling
    if sh not in (1, 2) or sv not in (1, 2):
        raise ValueError("luma sampling factors must be 1 or 2")
    q = quant or STD_LUM_QUANT
    h = len(pixels)
    w = len(pixels[0])
    # RGB → YCbCr (JFIF/BT.601 full-range), level-shifted by 128
    yp = [[0.0] * w for _ in range(h)]
    cbp = [[0.0] * w for _ in range(h)]
    crp = [[0.0] * w for _ in range(h)]
    for yy in range(h):
        for xx in range(w):
            r, g, b = pixels[yy][xx]
            yp[yy][xx] = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
            cbp[yy][xx] = -0.168736 * r - 0.331264 * g + 0.5 * b
            crp[yy][xx] = 0.5 * r - 0.418688 * g - 0.081312 * b
    # chroma box-downsample by (sh, sv) with edge replication
    cw = -(-w // sh)
    ch_ = -(-h // sv)

    def downsample(plane: list[list[float]]) -> list[list[float]]:
        if sh == 1 and sv == 1:
            return plane
        out = [[0.0] * cw for _ in range(ch_)]
        for yy in range(ch_):
            for xx in range(cw):
                s = 0.0
                for dy in range(sv):
                    for dx in range(sh):
                        s += plane[min(yy * sv + dy, h - 1)][min(xx * sh + dx, w - 1)]
                out[yy][xx] = s / (sh * sv)
        return out

    cb_s, cr_s = downsample(cbp), downsample(crp)
    dc_codes = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_codes = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    bw = _BitWriter()
    mcus_x = -(-w // (8 * sh))
    mcus_y = -(-h // (8 * sv))
    preds = [0, 0, 0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            # luma: sv×sh blocks, raster order within the MCU
            for by_ in range(sv):
                for bx_ in range(sh):
                    preds[0] = _encode_block(
                        bw,
                        _plane_block(yp, (my * sv + by_) * 8, (mx * sh + bx_) * 8),
                        q, dc_codes, ac_codes, preds[0],
                    )
            preds[1] = _encode_block(
                bw, _plane_block(cb_s, my * 8, mx * 8), q, dc_codes, ac_codes, preds[1]
            )
            preds[2] = _encode_block(
                bw, _plane_block(cr_s, my * 8, mx * 8), q, dc_codes, ac_codes, preds[2]
            )
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    samp_luma = (sh << 4) | sv
    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, samp_luma, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    dqt = seg(0xDB, b"\x00" + bytes(q[k] for k in range(64)))
    dht = seg(0xC4, b"\x00" + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS)) + seg(
        0xC4, b"\x10" + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS)
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"


def encode_jpeg_gray_progressive(
    pixels: list[list[int]],
    quant: list[int] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """rows of 0-255 luma → PROGRESSIVE (SOF2) single-component JPEG:
    spectral selection (DC | AC 1-5 | AC 6-63) × successive
    approximation (first pass at Al=1, refinement to Al=0) — six
    scans, exercising every progressive decode path (DC first/refine,
    AC first with EOB runs, AC refinement with correction bits).
    A nonzero restart_interval emits DRI + RSTn every N blocks inside
    EVERY scan (predictors and EOB runs reset at each restart — the
    decoder path real-world progressive files with restarts take).
    Exists so tests round-trip REAL progressive streams; with a unit
    quant table the decode must match the baseline encoder's output
    bit-for-bit (same coefficients, different transport)."""
    q = quant or STD_LUM_QUANT
    h = len(pixels)
    w = len(pixels[0])
    dc_codes = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    # the Annex K AC table defines no EOBn symbols beyond EOB1 (0x00)
    # — progressive EOB runs need (n<<4|0) up to 0xE0, so the AC scans
    # use a flat canonical table carrying all 256 symbols at 9 bits
    # (table id 1; DC scans keep the Annex K table 0)
    ac_prog_bits = [0] * 16
    # BITS entries are single bytes, so 256 symbols split 255 @ 9 bits
    # + 1 @ 10 bits (its canonical code is 0b1111111110 — not the
    # forbidden all-ones); symbol 0xFF lands on the long code and is
    # never emitted anyway
    ac_prog_bits[8] = 255
    ac_prog_bits[9] = 1
    ac_prog_vals = list(range(256))
    ac_codes = _canonical_codes(ac_prog_bits, ac_prog_vals)
    # quantized coefficient blocks, zigzag order
    blocks: list[list[int]] = []
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            blk = [
                float(pixels[min(by + i, h - 1)][min(bx + j, w - 1)] - 128)
                for i in range(8)
                for j in range(8)
            ]
            coef = _fdct(blk)
            blocks.append([int(round(coef[ZIGZAG[k]] / q[k])) for k in range(64)])

    def sos(ss: int, se: int, ah: int, al: int, scan: bytes) -> bytes:
        tids = 0x00 if ss == 0 else 0x01  # DC: tables 0/0; AC: ac table 1
        body = bytes([1, 1, tids, ss, se, (ah << 4) | al])
        return struct.pack(">BBH", 0xFF, 0xDA, len(body) + 2) + body + scan

    def _restart(bw, u, n_rst, eob=None):
        """Emit RSTn at a restart boundary (aligning first, flushing
        any pending EOB run); returns the next marker ordinal."""
        if not restart_interval or u == 0 or u % restart_interval:
            return n_rst
        if eob is not None:
            eob.flush()
        bw.align()
        bw.raw_marker(0xD0 + (n_rst % 8))
        return n_rst + 1

    def dc_first(al: int) -> bytes:
        bw = _BitWriter()
        pred = 0
        n_rst = 0
        for u, zz in enumerate(blocks):
            nxt = _restart(bw, u, n_rst)
            if nxt != n_rst:
                n_rst, pred = nxt, 0
            t = zz[0] >> al  # arithmetic shift: the T.81 DC point transform
            size, bits = _magnitude(t - pred)
            pred = t
            code, length = dc_codes[size]
            bw.write(code, length)
            if size:
                bw.write(bits, size)
        return bw.flush()

    def dc_refine(al: int) -> bytes:
        bw = _BitWriter()
        n_rst = 0
        for u, zz in enumerate(blocks):
            n_rst = _restart(bw, u, n_rst)
            bw.write((zz[0] >> al) & 1, 1)
        return bw.flush()

    class _Eob:
        """Cross-block EOB-run + (refinement) buffered correction
        bits, flushed before any non-EOB symbol."""

        def __init__(self, bw_: _BitWriter) -> None:
            self.bw = bw_
            self.run = 0
            self.pending: list[int] = []

        def flush(self) -> None:
            if self.run > 0:
                nbits = self.run.bit_length() - 1
                code, length = ac_codes[nbits << 4]
                self.bw.write(code, length)
                if nbits:
                    self.bw.write(self.run - (1 << nbits), nbits)
                self.run = 0
            for b in self.pending:
                self.bw.write(b, 1)
            self.pending = []

        def add(self, corrections: list[int]) -> None:
            self.run += 1
            self.pending.extend(corrections)
            if self.run == 0x7FFF:
                self.flush()

    def ac_first(ss: int, se: int, al: int) -> bytes:
        bw = _BitWriter()
        eob = _Eob(bw)
        n_rst = 0
        for u, zz in enumerate(blocks):
            n_rst = _restart(bw, u, n_rst, eob)
            r = 0
            wrote = False
            for k in range(ss, se + 1):
                t = zz[k]
                t = -((-t) >> al) if t < 0 else t >> al  # toward-zero point transform
                if t == 0:
                    r += 1
                    continue
                eob.flush()
                while r > 15:
                    code, length = ac_codes[0xF0]  # ZRL
                    bw.write(code, length)
                    r -= 16
                size, bits = _magnitude(t)
                code, length = ac_codes[(r << 4) | size]
                bw.write(code, length)
                bw.write(bits, size)
                r = 0
                wrote = True
            if r > 0 or not wrote:
                eob.add([])
        eob.flush()
        return bw.flush()

    def ac_refine(ss: int, se: int, al: int) -> bytes:
        # ah = al + 1: history is the coefficient seen at al+1 bits of
        # approximation; newly-significant values are ±1 at this al.
        # The emission order must mirror the decoder's WALK exactly: a
        # symbol (ZRL or run+1), its sign bit, then the correction
        # bits of the nonzero-history coefficients the walk crosses —
        # in positional order, only up to that symbol's stopping point
        # (the 16th zero for ZRL, the insertion position for run+1).
        bw = _BitWriter()
        eob = _Eob(bw)
        n_rst = 0
        for u, zz in enumerate(blocks):
            n_rst = _restart(bw, u, n_rst, eob)
            # one event per band position: ('c', bit) nonzero-history,
            # ('z',) still-zero, ('n', signbit) newly significant
            events: list[tuple] = []
            for k in range(ss, se + 1):
                c = zz[k]
                mag = -c if c < 0 else c
                if mag >> (al + 1) != 0:
                    events.append(("c", (mag >> al) & 1))
                elif (mag >> al) == 0:
                    events.append(("z",))
                else:
                    events.append(("n", 1 if c > 0 else 0))
            i = 0
            for j, ev in enumerate(events):
                if ev[0] != "n":
                    continue
                eob.flush()
                zeros = sum(1 for e in events[i:j] if e[0] == "z")
                while zeros > 15:
                    code, length = ac_codes[0xF0]  # ZRL: consumes 16 zeros
                    bw.write(code, length)
                    zc = 0
                    while zc < 16:
                        e = events[i]
                        i += 1
                        if e[0] == "z":
                            zc += 1
                        else:
                            bw.write(e[1], 1)
                    zeros -= 16
                code, length = ac_codes[(zeros << 4) | 1]
                bw.write(code, length)
                bw.write(ev[1], 1)  # sign bit (1 = +p1)
                while i < j:
                    e = events[i]
                    i += 1
                    if e[0] == "c":
                        bw.write(e[1], 1)
                i = j + 1  # the inserted coefficient itself
            if i < len(events):  # tail (or fully symbol-less block) → EOB
                eob.add([e[1] for e in events[i:] if e[0] == "c"])
        eob.flush()
        return bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    dqt = seg(0xDB, b"\x00" + bytes(q[k] for k in range(64)))
    dri = (
        seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    )
    sof = seg(0xC2, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht = (
        seg(0xC4, b"\x00" + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS))
        + seg(0xC4, b"\x11" + bytes(ac_prog_bits) + bytes(ac_prog_vals))
    )
    return (
        b"\xff\xd8"
        + dqt
        + dri
        + sof
        + dht
        + sos(0, 0, 0, 1, dc_first(1))
        + sos(0, 0, 1, 0, dc_refine(0))
        + sos(1, 5, 0, 1, ac_first(1, 5, 1))
        + sos(6, 63, 0, 1, ac_first(6, 63, 1))
        + sos(1, 5, 1, 0, ac_refine(1, 5, 0))
        + sos(6, 63, 1, 0, ac_refine(6, 63, 0))
        + b"\xff\xd9"
    )


# --- decoder ---------------------------------------------------------------


def is_jpeg(payload: bytes) -> bool:
    return payload[:2] == b"\xff\xd8"


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at any
    real marker and surfaces it (restart handling is the caller's)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise EOFError("read past marker")
        if self.pos >= len(self.data):
            raise EOFError("truncated scan")
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
            if nxt == 0x00:
                self.pos += 1
            else:
                self.marker = nxt
                raise EOFError("marker in scan")
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_code(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("bad huffman code")

    def align_and_expect_rst(self, n: int) -> None:
        """Consume padding up to the RSTn marker and step past it."""
        self.nbits = 0
        self.acc = 0
        if self.marker is None:
            # marker not yet hit — scan forward to it
            while self.pos < len(self.data):
                if (
                    self.data[self.pos] == 0xFF
                    and self.pos + 1 < len(self.data)
                    and self.data[self.pos + 1] != 0x00
                ):
                    self.marker = self.data[self.pos + 1]
                    self.pos += 1
                    break
                self.pos += 1
        if self.marker != 0xD0 + (n % 8):
            raise ValueError("expected restart marker")
        self.pos += 1
        self.marker = None


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map `size` raw bits to the signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _idct(coef: list[float]) -> list[int]:
    out = []
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                cu = _C[u] * _COS[u][x]
                for v in range(8):
                    c = coef[u * 8 + v]
                    if c:
                        s += _C[v] * cu * _COS[v][y] * c
            px = int(round(0.25 * s)) + 128
            out.append(0 if px < 0 else 255 if px > 255 else px)
    return out


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, raw) — raw is row-major gray (1
    channel) or interleaved RGB (3 channels). Baseline (SOF0/SOF1)
    AND progressive (SOF2) Huffman with any T.81 sampling factors
    (4:4:4 / 4:2:2 / 4:2:0 / …), restart markers included;
    arithmetic-coded, lossless and 12-bit-precision streams raise
    NotImplementedError for the caller's fallback ladder."""
    if not is_jpeg(payload):
        raise ValueError("not a JPEG")
    quant: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    pos = 2
    scan_pos = None
    progressive = False
    prog: _ProgressiveState | None = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker stream")
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker in (0x01,) or 0xD0 <= marker <= 0xD8:  # TEM, RST0-7, SOI
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if seglen < 2:
            raise ValueError("bad segment length")
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0x0F
                if prec != 0:
                    raise NotImplementedError("16-bit quant tables")
                quant[tid] = list(body[b + 1 : b + 65])
                b += 65
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                if b + 17 > len(body):
                    raise ValueError("truncated huffman table header")
                cls, tid = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                vals = list(body[b + 17 : b + 17 + n])
                if len(vals) < n:
                    raise ValueError("truncated huffman table values")
                (huff_dc if cls == 0 else huff_ac)[tid] = _decode_table(bits, vals)
                b += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("non-8-bit JPEG")
            if w * h > (MAX_PIXELS_PROGRESSIVE if progressive else MAX_PIXELS) or w == 0 or h == 0:
                # poison-payload guard: a mutated SOF must not trigger a
                # giant plane allocation before the scan data runs out
                # (progressive holds full coefficient arrays in memory,
                # hence the tighter cap)
                raise ValueError("implausible JPEG dimensions")
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG")
            for c in range(nc):
                cid, samp, qid = body[6 + 3 * c : 9 + 3 * c]
                sx, sy = samp >> 4, samp & 0x0F
                if not (1 <= sx <= 4 and 1 <= sy <= 4):
                    raise ValueError("bad sampling factors")
                comps.append({"id": cid, "qid": qid, "h": sx, "v": sy})
            if nc == 1:
                # single-component scans are never interleaved (T.81
                # A.2.2): sampling factors do not shape the data
                comps[0]["h"] = comps[0]["v"] = 1
            if sum(c["h"] * c["v"] for c in comps) > 10:
                raise ValueError("sampling factors exceed T.81 MCU budget")
        elif 0xC3 <= marker <= 0xCF and marker != 0xC4 and marker != 0xC8 and marker != 0xCC:
            raise NotImplementedError("non-baseline JPEG (lossless/arithmetic)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for s in range(ns):
                cid, tids = body[1 + 2 * s], body[2 + 2 * s]
                for ci, comp in enumerate(comps):
                    if comp["id"] == cid:
                        comp["dc"] = tids >> 4
                        comp["ac"] = tids & 0x0F
                        scan_comps.append(ci)
            if not progressive:
                scan_pos = pos + 2 + seglen
                break
            # progressive: this scan contributes (Ss..Se, Ah→Al) bits
            # of the coefficient store; decode it and keep walking the
            # marker stream (tables may be redefined between scans)
            ss, se, a = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            if prog is None:
                prog = _ProgressiveState(w, h, comps)
            pos = prog.decode_scan(
                payload, pos + 2 + seglen, scan_comps,
                ss, se, a >> 4, a & 0x0F,
                huff_dc, huff_ac, restart_interval,
            )
            continue
        elif marker == 0xD9:  # EOI
            break
        pos += 2 + seglen
    if progressive:
        if prog is None:
            raise ValueError("no scan data")
        return _render(w, h, comps, quant, prog.coeffs, prog.geom)
    if scan_pos is None or not comps or w == 0:
        raise ValueError("no scan data")

    br = _BitReader(payload, scan_pos)
    # interleaved-MCU geometry (T.81 A.2.3): the MCU covers 8·Hmax ×
    # 8·Vmax pixels; component i contributes v_i×h_i blocks per MCU and
    # stores its plane at (h_i/Hmax, v_i/Vmax) of full resolution —
    # this is how 4:2:0/4:2:2 chroma arrives
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    strides = [mcus_x * c["h"] * 8 for c in comps]
    planes = [[0] * (strides[ci] * mcus_y * comps[ci]["v"] * 8) for ci in range(len(comps))]
    preds = [0] * len(comps)
    mcu = 0
    n_rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.align_and_expect_rst(n_rst)
                n_rst += 1
                preds = [0] * len(comps)
            for ci, comp in enumerate(comps):
                q = quant[comp["qid"]]
                for by_ in range(comp["v"]):
                    for bx_ in range(comp["h"]):
                        zz = [0] * 64
                        size = br.read_code(huff_dc[comp["dc"]])
                        preds[ci] += _extend(br.read(size), size) if size else 0
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = br.read_code(huff_ac[comp["ac"]])
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.read(size), size)
                            k += 1
                        coef = [0.0] * 64
                        for k in range(64):
                            coef[ZIGZAG[k]] = zz[k] * q[k]
                        block = _idct(coef)
                        plane = planes[ci]
                        stride = strides[ci]
                        row0 = (my * comp["v"] + by_) * 8
                        col0 = (mx * comp["h"] + bx_) * 8
                        for i in range(8):
                            base = (row0 + i) * stride + col0
                            plane[base : base + 8] = block[i * 8 : i * 8 + 8]
            mcu += 1

    return _planes_to_raw(w, h, comps, planes, strides)


def _planes_to_raw(
    w: int, h: int, comps: list[dict], planes: list[list[int]], strides: list[int]
) -> tuple[int, int, int, bytes]:
    """Stored-resolution component planes → (w, h, channels, raw),
    box-replicating subsampled chroma up to full resolution at the
    YCbCr→RGB step (shared by the baseline and progressive paths)."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if len(comps) == 1:
        stride = strides[0]
        raw = bytearray(w * h)
        for y in range(h):
            raw[y * w : (y + 1) * w] = bytes(planes[0][y * stride : y * stride + w])
        return w, h, 1, bytes(raw)
    raw = bytearray(w * h * 3)
    yp, cbp, crp = planes
    ys, cbs, crs = strides
    # per-component upsample maps: full-res (x, y) → stored plane index
    # (box replication — each stored chroma sample covers an
    # (Hmax/h)×(Vmax/v) pixel cell)
    c1, c2, c3 = comps
    for y in range(h):
        y0 = (y * c1["v"] // vmax) * ys
        y1 = (y * c2["v"] // vmax) * cbs
        y2 = (y * c3["v"] // vmax) * crs
        for x in range(w):
            Y = yp[y0 + (x * c1["h"] // hmax)]
            cb = cbp[y1 + (x * c2["h"] // hmax)] - 128
            cr = crp[y2 + (x * c3["h"] // hmax)] - 128
            o = 3 * (y * w + x)
            r = int(round(Y + 1.402 * cr))
            g = int(round(Y - 0.344136 * cb - 0.714136 * cr))
            b = int(round(Y + 1.772 * cb))
            raw[o] = 0 if r < 0 else 255 if r > 255 else r
            raw[o + 1] = 0 if g < 0 else 255 if g > 255 else g
            raw[o + 2] = 0 if b < 0 else 255 if b > 255 else b
    return w, h, 3, bytes(raw)


class _ProgressiveState:
    """Coefficient store + scan decoder for SOF2 progressive JPEG
    (T.81 G.2): each scan contributes a spectral band (Ss..Se) at a
    successive-approximation bit position (Ah→Al); the image renders
    once, after all scans, from the accumulated coefficients. Blocks
    are stored in ZIGZAG order (index k), matching the scan syntax;
    dezigzag happens at render."""

    def __init__(self, w: int, h: int, comps: list[dict]):
        self.comps = comps
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        self.mcus_x = -(-w // (8 * hmax))
        self.mcus_y = -(-h // (8 * vmax))
        self.geom = []
        self.coeffs: list[list[list[list[int]]]] = []
        for c in comps:
            bw_pad = self.mcus_x * c["h"]
            bh_pad = self.mcus_y * c["v"]
            # non-interleaved scans cover only the component's TRUE
            # block grid (T.81 A.2.2), not the MCU-padded one
            comp_w = -(-w * c["h"] // hmax)
            comp_h = -(-h * c["v"] // vmax)
            self.geom.append(
                {
                    "bw_pad": bw_pad,
                    "bh_pad": bh_pad,
                    "bw": -(-comp_w // 8),
                    "bh": -(-comp_h // 8),
                }
            )
            self.coeffs.append(
                [[[0] * 64 for _ in range(bw_pad)] for _ in range(bh_pad)]
            )

    def decode_scan(
        self,
        payload: bytes,
        start: int,
        scan_comps: list[int],
        ss: int,
        se: int,
        ah: int,
        al: int,
        huff_dc: dict,
        huff_ac: dict,
        restart_interval: int,
    ) -> int:
        """Decode one scan's entropy data; returns the payload offset
        of the next marker (the 0xFF byte)."""
        if not (0 <= ss <= se <= 63) or al > 13 or ah > 14:
            raise ValueError("bad spectral/approximation parameters")
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan must have Se=0 (T.81 G.1)")
        if ss > 0 and len(scan_comps) != 1:
            raise ValueError("AC scan must be single-component")
        br = _BitReader(payload, start)
        comps = self.comps
        preds = [0] * len(comps)
        self._eobrun = 0

        def dc_block(block: list[int], ci: int) -> None:
            if ah == 0:
                size = br.read_code(huff_dc[comps[ci]["dc"]])
                preds[ci] += _extend(br.read(size), size) if size else 0
                block[0] = preds[ci] << al
            elif br.read(1):
                block[0] |= 1 << al

        def ac_first(block: list[int], ci: int) -> None:
            if self._eobrun > 0:
                self._eobrun -= 1
                return
            k = ss
            while k <= se:
                rs = br.read_code(huff_ac[comps[ci]["ac"]])
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:  # ZRL
                        k += 16
                        continue
                    self._eobrun = (1 << r) - 1
                    if r:
                        self._eobrun += br.read(r)
                    return
                k += r
                if k > se:
                    raise ValueError("AC index overflow")
                block[k] = _extend(br.read(s), s) << al
                k += 1

        def ac_refine(block: list[int], ci: int) -> None:
            # T.81 G.2 / the standard successive-approximation
            # correction pass: every nonzero-history coefficient the
            # scan pointer crosses reads one correction bit
            p1, m1 = 1 << al, -(1 << al)
            k = ss
            if self._eobrun == 0:
                while k <= se:
                    rs = br.read_code(huff_ac[comps[ci]["ac"]])
                    r, s = rs >> 4, rs & 0x0F
                    val = 0
                    if s == 0:
                        if r != 15:
                            self._eobrun = 1 << r
                            if r:
                                self._eobrun += br.read(r)
                            break
                    else:
                        if s != 1:
                            raise ValueError("bad refinement magnitude")
                        val = p1 if br.read(1) else m1
                    while k <= se:
                        c = block[k]
                        if c != 0:
                            if br.read(1) and (c & p1) == 0:
                                block[k] = c + (p1 if c >= 0 else m1)
                        else:
                            r -= 1
                            if r < 0:
                                break
                        k += 1
                    if val and k <= se:
                        block[k] = val
                    k += 1
            if self._eobrun > 0:
                while k <= se:
                    c = block[k]
                    if c != 0:
                        if br.read(1) and (c & p1) == 0:
                            block[k] = c + (p1 if c >= 0 else m1)
                    k += 1
                self._eobrun -= 1

        def restart(n_rst: int) -> None:
            br.align_and_expect_rst(n_rst)
            nonlocal preds
            preds = [0] * len(comps)
            self._eobrun = 0

        unit = 0
        n_rst = 0
        if len(scan_comps) > 1:
            # interleaved DC scan: MCU order
            for my in range(self.mcus_y):
                for mx in range(self.mcus_x):
                    if restart_interval and unit and unit % restart_interval == 0:
                        restart(n_rst)
                        n_rst += 1
                    for ci in scan_comps:
                        c = comps[ci]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                dc_block(
                                    self.coeffs[ci][my * c["v"] + by][mx * c["h"] + bx],
                                    ci,
                                )
                    unit += 1
        else:
            ci = scan_comps[0]
            g = self.geom[ci]
            fn = dc_block if ss == 0 else (ac_first if ah == 0 else ac_refine)
            for brow in range(g["bh"]):
                for bcol in range(g["bw"]):
                    if restart_interval and unit and unit % restart_interval == 0:
                        restart(n_rst)
                        n_rst += 1
                    fn(self.coeffs[ci][brow][bcol], ci)
                    unit += 1

        # position of the next marker: the reader may have stopped ON
        # one (self.marker) or mid-padding before it
        if br.marker is not None:
            return br.pos - 1
        p = br.pos
        while p + 1 < len(payload):
            if payload[p] == 0xFF and payload[p + 1] not in (0x00, 0xFF):
                return p
            p += 1
        return len(payload)


def _render(
    w: int,
    h: int,
    comps: list[dict],
    quant: dict[int, list[int]],
    coeffs: list[list[list[list[int]]]],
    geom: list[dict],
) -> tuple[int, int, int, bytes]:
    """Progressive final pass: dequantize + IDCT every accumulated
    block into component planes, then the shared plane→raw tail."""
    strides = [g["bw_pad"] * 8 for g in geom]
    planes = [
        [0] * (strides[ci] * geom[ci]["bh_pad"] * 8) for ci in range(len(comps))
    ]
    for ci, comp in enumerate(comps):
        q = quant[comp["qid"]]
        stride = strides[ci]
        for brow, row in enumerate(coeffs[ci]):
            for bcol, zz in enumerate(row):
                coef = [0.0] * 64
                for k in range(64):
                    if zz[k]:
                        coef[ZIGZAG[k]] = zz[k] * q[k]
                block = _idct(coef)
                plane = planes[ci]
                row0, col0 = brow * 8, bcol * 8
                for i in range(8):
                    base = (row0 + i) * stride + col0
                    plane[base : base + 8] = block[i * 8 : i * 8 + 8]
    return _planes_to_raw(w, h, comps, planes, strides)
