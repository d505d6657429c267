"""ISO-BMFF demux (core/mp4codec.py): synthesized-container round
trips (offsets byte-exact against the mdat payload), sample-table
resolution (stts/stsz/stsc/stco/stss), unsupported-variant fallbacks,
and the Spark demux_video_samples wiring (r3 verdict item 5: frame
SAMPLING gets real offsets; frame decode stays out of scope)."""

from __future__ import annotations

import struct

import pytest

from claude_readability_hook_spark.core.mp4codec import (
    MDAT_DATA_START,
    demux_mp4,
    encode_minimal_mp4,
    is_mp4,
)


def test_roundtrip_offsets_sizes_timestamps_sync():
    sizes = [50, 73, 60, 99, 51]
    mp4 = encode_minimal_mp4(sizes, seed=7, delta=40, timescale=1000)
    assert is_mp4(mp4)
    d = demux_mp4(mp4)
    assert d["duration_ms"] == 40 * len(sizes)
    (track,) = d["tracks"]
    assert track["handler"] == "vide" and track["timescale"] == 1000
    samples = track["samples"]
    assert [s[1] for s in samples] == sizes
    # offsets: contiguous from MDAT_DATA_START
    expect = MDAT_DATA_START
    for i, (off, size, ts, pts, sync) in enumerate(samples):
        assert off == expect
        expect += size
        assert ts == 40 * i
        assert pts == ts  # no ctts/elst ⇒ presentation == decode
        assert sync == (i % 2 == 0)  # stss every 2nd sample
    # offsets are REAL: the bytes at each offset are the seeded payload
    for i, (off, size, _ts, _pts, _sync) in enumerate(samples):
        assert mp4[off : off + size] == bytes(
            (7 + 31 * i + j) % 256 for j in range(size)
        )


def test_no_stss_means_every_sample_sync_and_audio_handler():
    mp4 = bytearray(encode_minimal_mp4([32, 32], seed=1, handler=b"soun"))
    # excise stss by renaming it to a free-space box ('skip')
    i = bytes(mp4).find(b"stss")
    mp4[i : i + 4] = b"skip"
    d = demux_mp4(bytes(mp4))
    (track,) = d["tracks"]
    assert track["handler"] == "soun"
    assert all(s[4] for s in track["samples"])


def test_fragmented_roundtrip_offsets_bytes_timing_sync():
    """moof/traf/trun walk: every demuxed (offset, size, ts, sync)
    matches the closed-form fragment layout AND the bytes at each
    offset are the seeded sample payload (the offsets really seek)."""
    from claude_readability_hook_spark.core.mp4codec import (
        encode_fragmented_mp4,
        fmp4_header_len,
        fmp4_moof_len,
    )

    frags = [[50, 60, 70], [80, 90, 100]]
    payload = encode_fragmented_mp4(frags, seed=5)
    out = demux_mp4(payload)
    [tr] = out["tracks"]
    assert tr["handler"] == "vide" and out["duration_ms"] == 240
    hdr, m3 = fmp4_header_len(), fmp4_moof_len(3)
    expect, cum, gi = [], 0, 0
    for f, sizes in enumerate(frags):
        for i, sz in enumerate(sizes):
            expect.append(
                (hdr + (f + 1) * (m3 + 8) + cum, sz, 40 * gi, 40 * gi, i == 0)
            )
            cum += sz
            gi += 1
    assert tr["samples"] == expect
    for gi, (off, sz, _ts, _pts, _sync) in enumerate(tr["samples"]):
        assert payload[off : off + sz] == bytes(
            (5 + 31 * gi + j) % 256 for j in range(sz)
        )


def test_fragmented_unsupported_shapes_raise():
    """trun-without-data-offset stays NotImplementedError (fallback
    ladder); an empty moof appended to a plain file routes to the
    fragmented path and errors instead of silently dropping the stbl
    samples."""
    from claude_readability_hook_spark.core.mp4codec import (
        encode_fragmented_mp4,
    )

    good = encode_fragmented_mp4([[40, 40]], seed=1)
    idx = good.find(b"trun")
    flags = int.from_bytes(good[idx + 5 : idx + 8], "big")
    nodo = good[: idx + 5] + (flags & ~0x1).to_bytes(3, "big") + good[idx + 8 :]
    with pytest.raises(NotImplementedError):
        demux_mp4(nodo)

    mp4 = encode_minimal_mp4([40], seed=0)
    frag = mp4 + struct.pack(">I", 8) + b"moof"
    with pytest.raises(ValueError):
        demux_mp4(frag)


def test_ctts_and_elst_yield_presentation_timestamps():
    """B-frame-style fixture: ctts composition offsets + an edit list
    (leading empty edit + media_time trim) remap pts while dts stays
    the stts cadence — byte offsets untouched."""
    sizes = [40, 40, 40, 40]
    cts = [40, 120, 0, 80]  # v1 signed offsets, media units
    mp4 = encode_minimal_mp4(
        sizes, seed=2, delta=40, ctts_offsets=cts,
        elst_media_time=40, elst_empty_ms=60,
    )
    (track,) = demux_mp4(mp4)["tracks"]
    for i, (off, _sz, ts, pts, _sync) in enumerate(track["samples"]):
        assert ts == 40 * i
        assert pts == 40 * i + cts[i] - 40 + 60
    # offsets still byte-exact despite the extra boxes (mdat precedes moov)
    assert track["samples"][0][0] == MDAT_DATA_START


def test_elst_media_time_only_shifts_pts_and_floor_divides_negatives():
    """media_time trim without ctts: pts = dts - media_time; a sample
    decoded before the edit start goes negative (trimmed priming)."""
    mp4 = encode_minimal_mp4([40, 40, 40], seed=1, delta=40, elst_media_time=40)
    (track,) = demux_mp4(mp4)["tracks"]
    assert [(s[2], s[3]) for s in track["samples"]] == [
        (0, -40), (40, 0), (80, 40)
    ]


def test_complex_elst_raises():
    """Multi-segment edit lists stay NotImplementedError (the poison
    ladder): append a second media edit to the elst."""
    mp4 = bytearray(encode_minimal_mp4([40, 40], seed=0, elst_media_time=0))
    i = bytes(mp4).find(b"elst")
    # bump entry_count 1 → 2 and splice in a second 12-byte v0 entry;
    # grow the elst/edts box sizes accordingly
    entry2 = struct.pack(">Iihh", 40, 80, 1, 0)
    insert_at = i + 12 + 12  # fourcc + verflags + count + first entry
    out = bytearray(mp4[: i - 4] + mp4[i - 4 : insert_at] + entry2 + mp4[insert_at:])
    for box_start in (i - 4, i - 4 - 8):  # elst header, edts header
        struct.pack_into(">I", out, box_start, struct.unpack_from(">I", mp4, box_start)[0] + 12)
    struct.pack_into(">I", out, i + 8, 2)  # entry_count
    # also grow the enclosing trak/moov sizes
    for fourcc in (b"trak", b"moov"):
        j = bytes(out).find(fourcc)
        struct.pack_into(">I", out, j - 4, struct.unpack_from(">I", out, j - 4)[0] + 12)
    with pytest.raises(NotImplementedError):
        demux_mp4(bytes(out))


def test_fragmented_trun_cts_and_elst():
    """fMP4 pts: v1 trun per-sample signed composition offsets + moov
    edit list remap presentation time across fragments."""
    from claude_readability_hook_spark.core.mp4codec import (
        encode_fragmented_mp4,
    )

    frags = [[50, 60], [70, 80]]
    cts = [[40, 120], [0, 80]]
    payload = encode_fragmented_mp4(
        frags, seed=3, fragment_cts=cts, elst_media_time=40, elst_empty_ms=20
    )
    [tr] = demux_mp4(payload)["tracks"]
    flat_cts = [c for fc in cts for c in fc]
    for gi, (_off, _sz, ts, pts, _sync) in enumerate(tr["samples"]):
        assert ts == 40 * gi
        assert pts == 40 * gi + flat_cts[gi] - 40 + 20


def test_fragmented_flagless_second_traf_raises():
    """ADVICE r5 medium: a flag-less traf AFTER the first in a moof
    must not silently resolve against the moof start (spec default is
    the previous traf's data end) — it raises for the fallback ladder."""
    from claude_readability_hook_spark.core.mp4codec import (
        FTYP,
        _box,
        _fmp4_moov,
        _full,
    )

    moov = _fmp4_moov(1000, b"vide", 40)
    mfhd = _full(b"mfhd", 0, 0, struct.pack(">I", 1))

    def traf(with_flags: int) -> bytes:
        tfhd = _full(b"tfhd", 0, with_flags, struct.pack(">I", 1))
        trun = _full(
            b"trun", 0, 0x1 | 0x200,
            struct.pack(">I", 1) + struct.pack(">i", 0) + struct.pack(">I", 10),
        )
        return _box(b"traf", tfhd + _full(b"tfdt", 1, 0, struct.pack(">Q", 0)) + trun)

    moof = _box(b"moof", mfhd + traf(0) + traf(0))
    payload = FTYP + moov + moof + _box(b"mdat", bytes(64))
    with pytest.raises(NotImplementedError):
        demux_mp4(payload)
    # with default-base-is-moof on the second traf it demuxes fine
    moof_ok = _box(b"moof", mfhd + traf(0) + traf(0x20000))
    payload_ok = FTYP + moov + moof_ok + _box(b"mdat", bytes(64))
    [tr] = demux_mp4(payload_ok)["tracks"]
    assert len(tr["samples"]) == 2


def test_poison_guards():
    mp4 = bytearray(encode_minimal_mp4([40, 40], seed=0))
    with pytest.raises(ValueError):
        demux_mp4(b"\x00" * 16)  # not mp4
    with pytest.raises((ValueError, struct.error)):
        demux_mp4(bytes(mp4[:40]))  # truncated: no moov
    # mutate stsz sample count to something implausible
    i = bytes(mp4).find(b"stsz")
    big = bytearray(mp4)
    big[i + 12 : i + 16] = struct.pack(">I", 1 << 28)
    with pytest.raises(ValueError):
        demux_mp4(bytes(big))
    # mutate stco chunk offset to point past EOF
    i = bytes(mp4).find(b"stco")
    bad = bytearray(mp4)
    bad[i + 12 : i + 16] = struct.pack(">I", 1 << 30)
    with pytest.raises(ValueError):
        demux_mp4(bytes(bad))


def test_spark_demux_video_samples_ok_and_sync_only(spark):
    from pyspark.sql import functions as F

    from claude_readability_hook_spark.operators.multimodal import (
        demux_video_samples,
        synthesize_media_table,
    )

    refs = [f"vid:{i}" for i in range(5)]
    media = synthesize_media_table(spark, refs, real_mp4=True)
    out = demux_video_samples(media)
    rows = out.collect()
    assert all(r["decode_ok"] == "ok" for r in rows)
    by_ref = {}
    for r in rows:
        by_ref.setdefault(r["media_ref"], []).append(r)
    for ref in refs:
        seed = sum(ref.encode())
        n = 4 + seed % 4
        samples = sorted(by_ref[ref], key=lambda r: r["sample_idx"])
        assert len(samples) == n
        # arithmetic layout: size and offset recomputable from the seed
        expect_off = MDAT_DATA_START
        for i, r in enumerate(samples):
            size = 50 + ((seed + 31 * i) % 100)
            assert r["size"] == size and r["offset"] == expect_off
            expect_off += size
            assert r["timestamp_ms"] == 40 * i
            assert r["is_sync"] == (i % 2 == 0)
    # keyframes only: the thumbnail-sampling policy
    sync_rows = demux_video_samples(media, sync_only=True).collect()
    assert all(r["is_sync"] for r in sync_rows)
    assert len(sync_rows) == sum(
        -(-(4 + sum(ref.encode()) % 4) // 2) for ref in refs
    )


def test_extract_video_frames_mjpeg_real_decode(spark):
    """Frame DECODE is real for MJPEG-in-MP4: demux offsets → JPEG
    entropy decode → luminance features; flat frames decode exactly,
    so each histogram is a point mass at value//16."""
    from claude_readability_hook_spark.operators.multimodal import (
        extract_video_frames,
        synthesize_media_table,
    )

    refs = [f"mj:{i}" for i in range(3)]
    media = synthesize_media_table(spark, refs, real_mjpeg=True)
    rows = extract_video_frames(media, sync_only=False).collect()
    assert rows and all(r["frame_ok"] == "ok" for r in rows)
    for r in rows:
        seed = sum(r["media_ref"].encode())
        v = (seed * 7 + 31 * r["sample_idx"]) % 256
        assert (r["width"], r["height"]) == (16, 16)
        assert abs(r["feature"][v // 16] - 1.0) < 1e-6
        assert r["timestamp_ms"] == 40 * r["sample_idx"]
    # sync-only keeps every 2nd frame (the keyframe policy)
    sync_rows = extract_video_frames(media, sync_only=True).collect()
    assert all(r["sample_idx"] % 2 == 0 for r in sync_rows)
    assert 0 < len(sync_rows) < len(rows)


def test_extract_video_frames_unknown_codec_stubs_per_frame(spark):
    """Samples whose bytes aren't a codec we carry (H.264-style) keep
    real demux metadata but frame_ok='stubbed' — only the pixel decode
    degrades."""
    from pyspark.sql import functions as F

    from claude_readability_hook_spark.operators.multimodal import (
        MEDIA,
        extract_video_frames,
    )

    mp4 = encode_minimal_mp4([60, 60], seed=3)  # filler samples, not JPEG
    df = spark.createDataFrame(
        [
            {
                "media_ref": "h264ish", "modality": "video", "payload": mp4,
                "width": None, "height": None, "duration_ms": 80,
                "mime": "video/mp4",
            }
        ],
        schema=MEDIA,
    )
    rows = extract_video_frames(df, sync_only=False).collect()
    assert len(rows) == 2
    assert all(r["frame_ok"] == "stubbed" and r["feature"] is None for r in rows)
    assert [r["timestamp_ms"] for r in sorted(rows, key=lambda r: r["sample_idx"])] == [0, 40]


def test_spark_demux_stubs_non_mp4_payloads(spark):
    from claude_readability_hook_spark.operators.multimodal import (
        demux_video_samples,
        synthesize_media_table,
    )
    from pyspark.sql import functions as F

    media = synthesize_media_table(spark, ["junk:a", "junk:b"]).withColumn(
        "modality", F.lit("video")
    )
    rows = demux_video_samples(media).collect()
    assert len(rows) == 2
    assert all(r["decode_ok"] == "stubbed" and r["offset"] is None for r in rows)


def test_fragmented_explicit_base_offset_and_multi_trun():
    """Hand-built fragment exercising the shapes the synthesizer does
    not emit: tfhd with an EXPLICIT base_data_offset (flag 0x1) plus
    default-sample-size (0x10), and TWO truns in one traf sharing the
    defaults — decode times continue across runs, offsets resolve
    against the explicit base."""
    from claude_readability_hook_spark.core.mp4codec import (
        FTYP,
        _box,
        _full,
        _fmp4_moov,
        demux_mp4,
    )

    moov = _fmp4_moov(1000, b"vide", 40)
    # payload: 4 samples of 10 bytes, back-to-back in one mdat
    mdat_payload = bytes(range(40))
    header_len = len(FTYP) + len(moov)

    def build(moof_len_guess: int) -> bytes:
        base = header_len + moof_len_guess + 8  # mdat body start
        mfhd = _full(b"mfhd", 0, 0, struct.pack(">I", 1))
        tfhd = _full(
            b"tfhd", 0, 0x1 | 0x10,
            struct.pack(">I", 1) + struct.pack(">Q", base) + struct.pack(">I", 10),
        )
        tfdt = _full(b"tfdt", 1, 0, struct.pack(">Q", 0))
        # trun A: 1 sample, data_offset 0 from base, first-sample sync
        trun_a = _full(
            b"trun", 0, 0x1 | 0x4,
            struct.pack(">I", 1) + struct.pack(">i", 0) + struct.pack(">I", 0),
        )
        # trun B: 3 samples, data_offset 10 from base (after trun A's)
        trun_b = _full(
            b"trun", 0, 0x1,
            struct.pack(">I", 3) + struct.pack(">i", 10),
        )
        moof = _box(b"moof", mfhd + _box(b"traf", tfhd + tfdt + trun_a + trun_b))
        return moof

    moof = build(0)
    moof = build(len(moof))  # fixpoint: moof length is flag-determined
    payload = FTYP + moov + moof + _box(b"mdat", mdat_payload)
    out = demux_mp4(payload)
    [tr] = out["tracks"]
    base = header_len + len(moof) + 8
    # durations come from the trex default (40 @ timescale 1000)
    assert tr["samples"] == [
        (base, 10, 0, 0, True),         # trun A, first_sample_flags = sync
        (base + 10, 10, 40, 40, False), # trun B inherits trex non-sync default
        (base + 20, 10, 80, 80, False),
        (base + 30, 10, 120, 120, False),
    ]
    for i, (off, sz, _t, _pts, _s) in enumerate(tr["samples"]):
        assert payload[off : off + sz] == mdat_payload[10 * i : 10 * i + 10]
