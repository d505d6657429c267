"""WAV/PCM codec (core/wavcodec.py): RIFF round trips, multi-channel
downmix, format fallbacks, and the Spark multimodal wiring (audio
modality decode_ok='ok')."""

from __future__ import annotations

import math
import struct

import pytest

from claude_readability_hook_spark.core.wavcodec import (
    decode_wav,
    encode_wav,
    energy_envelope,
    is_wav,
    wav_duration_ms,
)


def _sine(n, freq=440, rate=8000, amp=16000):
    return [int(amp * math.sin(2 * math.pi * freq * i / rate)) for i in range(n)]


def test_pcm16_roundtrip_exact():
    samples = _sine(1000)
    wav = encode_wav(samples, sample_rate=8000)
    assert is_wav(wav)
    rate, ch, out = decode_wav(wav)
    assert (rate, ch) == (8000, 1)
    assert len(out) == 1000
    assert all(abs(out[i] - samples[i] / 32768.0) < 1e-9 for i in range(1000))
    assert wav_duration_ms(wav) == 125  # 1000 / 8000 s


def test_stereo_downmix_mean():
    # L = 1000, R = 3000 → mean 2000
    inter = [1000, 3000] * 50
    rate, ch, out = decode_wav(encode_wav(inter, sample_rate=8000, channels=2))
    assert ch == 2 and len(out) == 50
    assert all(abs(s - 2000 / 32768.0) < 1e-9 for s in out)


def test_energy_envelope_localizes_the_loud_window():
    """Silence with a burst in the third quarter: the envelope mass
    must sit in the burst windows."""
    n = 1600
    samples = [0] * n
    for i in range(n // 2, 3 * n // 4):
        samples[i] = _sine(1, 440)[0] or 12000
        samples[i] = int(12000 * math.sin(2 * math.pi * 440 * i / 8000))
    env = energy_envelope(encode_wav(samples), dim=4)
    assert abs(sum(env) - 1.0) < 1e-5
    assert env[2] > 0.9 and env[0] == 0.0 and env[1] == 0.0 and env[3] == 0.0


def test_silence_envelope_is_zero():
    assert energy_envelope(encode_wav([0] * 256), dim=8) == [0.0] * 8


def test_ieee_float_and_8bit_supported_compressed_not():
    # float32 WAV assembled by hand
    data = struct.pack("<4f", 0.5, -0.5, 0.25, -0.25)
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(data)) + data)
    rate, ch, out = decode_wav(wav)
    assert out == [0.5, -0.5, 0.25, -0.25]

    # 8-bit unsigned PCM
    data8 = bytes([128, 255, 0, 128])
    fmt8 = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    wav8 = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt8) + 8 + len(data8)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt8)) + fmt8
            + b"data" + struct.pack("<I", len(data8)) + data8)
    _r, _c, out8 = decode_wav(wav8)
    assert out8 == [0.0, 127 / 128, -1.0, 0.0]

    # ADPCM (format tag 2) → NotImplementedError (fallback ladder)
    fmt2 = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)
    wav2 = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt2) + 8 + 4) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt2)) + fmt2
            + b"data" + struct.pack("<I", 4) + b"\x00\x01\x02\x03")
    with pytest.raises(NotImplementedError):
        decode_wav(wav2)


def test_not_wav_raises_value_error():
    with pytest.raises(ValueError):
        decode_wav(b"\x89PNG\r\n\x1a\n not audio")


def test_audio_stats_real_and_fallback(spark):
    from claude_readability_hook_spark.operators.multimodal import (
        audio_stats,
        synthesize_media_table,
    )

    real = synthesize_media_table(spark, ["aud:x", "aud:y"], real_wav=True)
    rows = {r["media_ref"]: r for r in audio_stats(real).collect()}
    for ref, r in rows.items():
        seed = sum(ref.encode())
        assert r["decode_ok"] == "ok"
        assert r["sample_rate"] == 8000 and r["channels"] == 1
        assert r["n_samples"] == 800 + seed % 400
        assert 0 < r["peak"] <= 12000

    fake = synthesize_media_table(spark, ["aud:z"])  # opaque bytes
    out = audio_stats(fake).collect()[0]
    assert out["decode_ok"] == "stubbed" and out["peak"] is None


def test_media_features_real_wav_decode_ok(spark):
    from claude_readability_hook_spark.operators.multimodal import (
        extract_media_features,
        synthesize_media_table,
    )

    media = synthesize_media_table(
        spark, [f"aud:{i}" for i in range(4)], real_wav=True
    )
    rows = extract_media_features(media).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["modality"] == "audio"
        assert r["decode_ok"] == "ok"
        assert r["feature"] is not None and abs(sum(r["feature"]) - 1.0) < 1e-4
