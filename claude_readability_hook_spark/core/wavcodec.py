"""Pure-Python WAV/PCM audio codec — the audio analog of the PNG/JPEG
decoders: RIFF chunk walk + PCM sample decode, no audio library.

Scope (honest): RIFF/WAVE with integer PCM (format tag 1; 8-bit
unsigned / 16-bit signed LE) and IEEE float32 (format tag 3), mono or
interleaved multi-channel (downmixed by mean). Compressed formats
(MP3/AAC/ADPCM, format tags ≠ 1/3) raise NotImplementedError so the
multimodal ladder falls back with decode_ok='stubbed'.

The feature is an ENERGY ENVELOPE: per-window RMS over `dim` equal
windows, L1-normalized — the audio twin of the image luminance
histogram (same FEATURE_DIM contract, same downstream joins).

Reference parity note: claude-readability-hook carries media as opaque
refs end-to-end (no decode); this module is beyond-reference capability
for the training-data pipeline, like the rest of the media ladder."""

from __future__ import annotations

import math
import struct


def is_wav(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def encode_wav(
    samples: list[int], sample_rate: int = 16000, channels: int = 1
) -> bytes:
    """Interleaved 16-bit signed PCM → RIFF/WAVE (tests/bench — no
    fixture data). len(samples) must be a multiple of channels."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * channels * 2, channels * 2, 16,
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple[int, int, list[float]]:
    """(sample_rate, channels, mono samples in [-1, 1]) — multi-channel
    input downmixes by mean. Chunk walk honors chunk sizes and the
    RIFF word-alignment padding byte."""
    if not is_wav(payload):
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt_tag = channels = sample_rate = bits = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("truncated fmt chunk")
            fmt_tag, channels, sample_rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_tag is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if fmt_tag == 1 and bits == 16:
        n = len(data) // 2
        raw = struct.unpack(f"<{n}h", data[: 2 * n])
        scale = 32768.0
    elif fmt_tag == 1 and bits == 8:
        raw = [b - 128 for b in data]
        scale = 128.0
    elif fmt_tag == 3 and bits == 32:
        n = len(data) // 4
        raw = struct.unpack(f"<{n}f", data[: 4 * n])
        scale = 1.0
    else:
        raise NotImplementedError(
            f"unsupported WAV encoding (format tag {fmt_tag}, {bits}-bit)"
        )
    if channels > 1:
        frames = len(raw) // channels
        mono = [
            sum(raw[i * channels + c] for c in range(channels)) / channels
            for i in range(frames)
        ]
    else:
        mono = list(raw)
    return sample_rate, channels, [s / scale for s in mono]


def energy_envelope(payload: bytes, dim: int = 16) -> list[float]:
    """Per-window RMS over `dim` equal windows, L1-normalized — the
    audio feature vector (silence ⇒ zeros)."""
    _rate, _ch, samples = decode_wav(payload)
    if not samples:
        return [0.0] * dim
    n = len(samples)
    rms = []
    for w in range(dim):
        lo, hi = w * n // dim, max((w + 1) * n // dim, w * n // dim + 1)
        window = samples[lo:hi] or [0.0]
        rms.append(math.sqrt(sum(s * s for s in window) / len(window)))
    total = sum(rms)
    if total == 0:
        return [0.0] * dim
    return [round(r / total, 6) for r in rms]


def wav_duration_ms(payload: bytes) -> int:
    rate, _ch, samples = decode_wav(payload)
    return int(round(1000 * len(samples) / rate)) if rate else 0
