"""Perceptual audio dedup (operators/audiodedup.py): envelope
fingerprint exactness, planted-twin distances, banding completeness
vs the brute-force check, bucket-cap quarantine, and poison isolation
— the imagededup test story retargeted at the audio rung."""

from __future__ import annotations

from pyspark.sql import functions as F

from claude_readability_hook_spark.core.wavcodec import encode_wav
from claude_readability_hook_spark.operators.audiodedup import (
    AUDIO_FP_DIM,
    _envelope_bits,
    audio_dup_pairs,
    audio_fingerprints,
)
from claude_readability_hook_spark.operators.multimodal import (
    synthesize_media_table,
)

N_REFS = 16


def _media(spark):
    base = synthesize_media_table(
        spark, [f"au:{i}" for i in range(N_REFS)], real_wav_am=True
    )
    twin = synthesize_media_table(
        spark,
        [f"ua:{i}" for i in range(N_REFS)],
        real_wav_am=True,
        wav_am_twin=True,
    )
    return base.unionByName(twin)


def test_envelope_bits_pure_and_signed():
    # loud first half, quiet second half → low 32 bits set, high clear
    samples = [20000.0 / 32768.0] * 640 + [100.0 / 32768.0] * 640
    fp = _envelope_bits(samples)
    assert fp == (1 << 32) - 1
    # all-equal windows: strict majority never fires
    assert _envelope_bits([0.25] * 1280) == 0
    # bit 63 loud-tail clip packs to a NEGATIVE long (two's complement)
    tail_loud = [100.0 / 32768.0] * 640 + [20000.0 / 32768.0] * 640
    fp_tail = _envelope_bits(tail_loud)
    assert fp_tail < 0
    assert -(1 << 63) <= fp_tail < (1 << 63)


def test_fingerprints_deterministic_and_twin_distance(spark):
    fps = audio_fingerprints(_media(spark))
    rows = {r["media_ref"]: r for r in fps.collect()}
    assert len(rows) == 2 * N_REFS
    assert all(r["decode_ok"] == "ok" for r in rows.values())
    for i in range(N_REFS):
        a, b = rows[f"au:{i}"]["afp"], rows[f"ua:{i}"]["afp"]
        # the AM twin flips at most envelope bit 0
        d = bin((a ^ b) & ((1 << 64) - 1)).count("1")
        assert d <= 1, (i, d)
    # anagram prefixes share the seed → same-pattern fingerprints
    # repeat across the population (the dedup signal is real)
    again = {r["media_ref"]: r["afp"] for r in fps.collect()}
    assert again == {k: v["afp"] for k, v in rows.items()}


def test_dup_pairs_match_bruteforce(spark):
    fps = audio_fingerprints(_media(spark)).persist()
    try:
        pairs = {
            (r["ref_a"], r["ref_b"]): r["distance"]
            for r in audio_dup_pairs(
                fps, max_distance=3, max_bucket_size=None
            ).collect()
        }
        hashes = {r["media_ref"]: r["afp"] for r in fps.collect()}
        refs = sorted(hashes)
        brute = {}
        for i, ra in enumerate(refs):
            for rb in refs[i + 1 :]:
                d = bin((hashes[ra] ^ hashes[rb]) & ((1 << 64) - 1)).count("1")
                if d <= 3:
                    brute[(ra, rb)] = d
        assert pairs == brute
        # every planted twin pair is found
        for i in range(N_REFS):
            key = tuple(sorted((f"au:{i}", f"ua:{i}")))
            assert key in pairs and pairs[key] <= 1
    finally:
        fps.unpersist()


def test_bucket_cap_quarantines_megabuckets(spark):
    fps = audio_fingerprints(_media(spark))
    # same-pattern seeds collide at distance 0, so uncapped finds more
    uncapped = audio_dup_pairs(fps, max_distance=3, max_bucket_size=None).count()
    capped = audio_dup_pairs(fps, max_distance=3, max_bucket_size=2).count()
    assert capped <= uncapped


def test_poison_isolation(spark):
    rows = [
        ("good", "audio", bytearray(encode_wav([1000, -1000] * 64, 8000))),
        ("junk", "audio", bytearray(b"not a wav at all")),
        ("empty", "audio", None),
        ("image", "image", bytearray(b"\x89PNG....")),
    ]
    media = spark.createDataFrame(
        rows, "media_ref string, modality string, payload binary"
    )
    out = {r["media_ref"]: r for r in audio_fingerprints(media).collect()}
    assert out["good"]["decode_ok"] == "ok"
    assert out["good"]["n_samples"] == 128
    assert out["junk"]["decode_ok"] == "stubbed"
    assert out["junk"]["afp"] is None
    assert out["empty"]["decode_ok"] == "stubbed"
    assert "image" not in out  # modality filter keeps the scan narrow
    assert AUDIO_FP_DIM == 64  # banding machinery assumes 64-bit hashes
