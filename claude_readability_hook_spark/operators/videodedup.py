"""Temporal video near-duplicate detection: per-frame perceptual
hashes → per-video signatures → banded candidate search → aligned
exact verify.

The missing modality in the dedup ladder (text MinHash-LSH in
dedup.py, image Hamming-LSH in imagededup.py): the same clip
re-encoded, re-muxed, or lightly recompressed is a near-duplicate
that byte-hashing misses and single-thumbnail image dedup sees only
one frame of. The ladder here:

  video_frame_hashes   MP4 payload → demux (core/mp4codec) → decode
                       each frame with the image ladder (MJPEG/PNG
                       samples; H.264 degrades per-frame to 'stubbed'
                       exactly like extract_video_frames) → 64-bit
                       dHash per frame. Scan-side mapInPandas: the
                       video bytes are read once and never shuffle;
                       output is ~32 bytes per frame.
  video_dup_candidates frame hashes → the SAME 8-band Hamming-LSH as
                       images (two frames within Hamming distance 7
                       share a band, pigeonhole) → distinct candidate
                       VIDEO pairs. Any video pair with ≥1 close
                       frame pair becomes a candidate, so the final
                       criterion below loses nothing (it requires ≥1
                       aligned frame within max_frame_distance ≤ 7).
  video_dup_pairs      candidates → join both sides' frame tables on
                       sample_idx → exact per-frame Hamming distance
                       IN the row → per-pair rollup: matched_frames
                       (aligned frames within max_frame_distance),
                       n_frames = max(frame counts), match_frac —
                       keep pairs with match_frac ≥ min_match_frac.
  video_dup_clusters   connected components over the pairs (the
                       shared dedup_clusters pointer-jump loop),
                       keeper = min ref.

Scale discipline (the imagededup.py contract): banding bounds
candidate generation — no all-pairs video join anywhere; bucket caps
quarantine degenerate buckets (a station ident shared by millions of
clips); everything past the frame hash is narrow (ref, idx, long).
The verify join fans out per MATCHED sample index of CANDIDATE pairs
only — at crawl scale candidates are a vanishing fraction of the
corpus and frames per video are bounded by max_frames. Reference
parity: none — the reference treats media as opaque URLs; this is the
LLM-pipeline brief (VERDICT r6 'Next round #3').
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

VIDEO_FRAME_HASH = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("sample_idx", LongType(), True),
        StructField("timestamp_ms", LongType(), True),
        StructField("fhash", LongType(), True),
        StructField("frame_ok", StringType(), False),
    ]
)


def video_frame_hashes(media: DataFrame, max_frames: int = 8) -> DataFrame:
    """(media_ref, sample_idx, timestamp_ms, fhash, frame_ok) for
    kind='video' payloads: demux the MP4 sample table, decode each
    frame with the image ladder (JPEG — MJPEG-in-MP4 — or PNG-in-MP4),
    and dHash the decoded luminance plane. Frames in codecs we don't
    carry degrade per-FRAME to frame_ok='stubbed' with real sampling
    metadata (the extract_video_frames honesty contract); undemuxable
    payloads emit one stubbed row. max_frames bounds work per video —
    at 8 frames the signature already separates re-encodes from
    distinct content, and the frame table stays O(8) rows/video."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..core.imagecodec import _decoded_lum, _dhash_from_plane
        from ..core.mp4codec import demux_mp4, is_mp4

        def frame_row(ref, idx, ts, raw):
            rec = {
                "media_ref": ref, "sample_idx": idx, "timestamp_ms": ts,
                "fhash": None, "frame_ok": "stubbed",
            }
            try:
                w, h, lum = _decoded_lum(raw)
                rec.update(fhash=_dhash_from_plane(w, h, lum), frame_ok="ok")
            except (NotImplementedError, ValueError):
                pass
            except Exception as exc:  # noqa: BLE001 — poison isolation
                rec["frame_ok"] = f"frame error: {type(exc).__name__}"
            return rec

        for batch in batches:
            records = []
            for ref, payload in zip(batch["media_ref"], batch["payload"]):
                raw = bytes(payload) if payload is not None else b""
                if not is_mp4(raw):
                    records.append(frame_row(ref, None, None, b""))
                    continue
                try:
                    parsed = demux_mp4(raw)
                    vid = [t for t in parsed["tracks"] if t["handler"] == "vide"]
                    if not vid:
                        records.append(frame_row(ref, None, None, b""))
                        continue
                    for i, (off, size, _ts, pts, _sync) in enumerate(
                        vid[0]["samples"][:max_frames]
                    ):
                        records.append(
                            frame_row(ref, i, pts, raw[off : off + size])
                        )
                except NotImplementedError:
                    records.append(frame_row(ref, None, None, b""))
                except Exception as exc:  # noqa: BLE001
                    records.append(
                        dict(
                            frame_row(ref, None, None, b""),
                            frame_ok=f"demux error: {type(exc).__name__}",
                        )
                    )
            yield pd.DataFrame.from_records(records)

    return (
        media.filter(F.col("modality") == "video")
        .select("media_ref", "payload")
        .mapInPandas(decode, schema=VIDEO_FRAME_HASH)
    )


def video_dup_candidates(
    frame_hashes: DataFrame,
    n_bands: int = 8,
    max_bucket_size: int | None = 50,
) -> DataFrame:
    """Distinct (ref_a, ref_b) candidate video pairs, ref_a < ref_b:
    every pair of videos with at least one cross-video frame pair
    within Hamming distance n_bands − 1 (banding pigeonhole), via the
    image ladder's hamming_band_buckets on the frame-hash column. A
    video's OWN frames sharing a bucket (static shots) expand to
    same-ref rows — filtered, never emitted. Buckets above
    max_bucket_size are dropped before the O(m²) expansion
    (video_oversize_buckets records them)."""
    from .imagededup import hamming_band_buckets

    grouped = hamming_band_buckets(
        frame_hashes.filter(F.col("frame_ok") == "ok"),
        n_bands,
        ref_col="media_ref",
        hash_col="fhash",
    )
    if max_bucket_size is not None:
        grouped = grouped.filter(F.size("members") <= max_bucket_size)
    m = F.size("members")
    pair_structs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), m - 1),
            lambda i: F.transform(
                F.sequence(i + 1, m),
                lambda j: F.struct(
                    F.element_at(F.col("members"), i).alias("a"),
                    F.element_at(F.col("members"), j).alias("b"),
                ),
            ),
        )
    )
    return (
        grouped.select(F.explode(pair_structs).alias("p"))
        .select(
            F.col("p.a.ref").alias("ref_a"),
            F.col("p.b.ref").alias("ref_b"),
        )
        .filter(F.col("ref_a") != F.col("ref_b"))
        .distinct()
    )


def video_oversize_buckets(
    frame_hashes: DataFrame,
    n_bands: int = 8,
    max_bucket_size: int = 50,
) -> DataFrame:
    """The buckets video_dup_candidates dropped: (band_idx, band_val,
    n_refs) quarantine metadata — the image/minhash oversize
    pattern."""
    from .imagededup import image_oversize_buckets

    return image_oversize_buckets(
        frame_hashes.filter(F.col("frame_ok") == "ok"),
        n_bands,
        max_bucket_size,
        ref_col="media_ref",
        hash_col="fhash",
    )


def video_dup_pairs(
    frame_hashes: DataFrame,
    max_frame_distance: int = 3,
    min_match_frac: float = 0.5,
    n_bands: int = 8,
    max_bucket_size: int | None = 50,
) -> DataFrame:
    """(ref_a, ref_b, matched_frames, n_frames, match_frac) temporal
    near-duplicate video pairs, ref_a < ref_b.

    Semantics: align frames by sample_idx (re-encodes and re-muxes
    preserve sample order; trims are a different operator), count
    aligned frame pairs whose dHashes sit within max_frame_distance,
    normalize by n_frames = max of the two videos' decoded frame
    counts — so a short clip matching a prefix of a longer one does
    NOT score 1.0 — and keep pairs with match_frac ≥ min_match_frac
    (6dp-rounded; IEEE division is exactly rounded, so the DuckDB
    oracle reproduces the frac bit-for-bit).

    Plan: candidates from the banded search (no all-pairs), then the
    verify join touches only candidate pairs' frame rows — two narrow
    shuffles on ref, one rollup."""
    ok = frame_hashes.filter(F.col("frame_ok") == "ok").select(
        "media_ref", "sample_idx", "fhash"
    )
    counts = ok.groupBy("media_ref").agg(
        F.count("*").cast("long").alias("n")
    )
    cands = video_dup_candidates(ok, n_bands, max_bucket_size)
    fa = ok.select(
        F.col("media_ref").alias("ref_a"),
        F.col("sample_idx").alias("idx"),
        F.col("fhash").alias("ha"),
    )
    fb = ok.select(
        F.col("media_ref").alias("ref_b"),
        F.col("sample_idx").alias("idx"),
        F.col("fhash").alias("hb"),
    )
    matched = (
        cands.join(fa, "ref_a")
        .join(fb, ["ref_b", "idx"])
        .groupBy("ref_a", "ref_b")
        .agg(
            F.sum(
                F.when(
                    F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
                    <= max_frame_distance,
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("matched_frames")
        )
    )
    ca = counts.select(F.col("media_ref").alias("ref_a"), F.col("n").alias("na"))
    cb = counts.select(F.col("media_ref").alias("ref_b"), F.col("n").alias("nb"))
    return (
        matched.join(ca, "ref_a")
        .join(cb, "ref_b")
        .select(
            "ref_a",
            "ref_b",
            "matched_frames",
            F.greatest("na", "nb").alias("n_frames"),
            F.round(
                F.col("matched_frames").cast("double")
                / F.greatest("na", "nb").cast("double"),
                6,
            ).alias("match_frac"),
        )
        .filter(F.col("match_frac") >= min_match_frac)
    )


def video_dup_clusters(pairs: DataFrame, max_iterations: int = 20) -> DataFrame:
    """(media_ref, cluster_id) connected components over temporal
    near-dup pairs, cluster_id = min ref — the canonical keeper.
    Delegates to the shared dedup_clusters adaptive pointer-jump
    loop, same as image_dup_clusters."""
    from .dedup import dedup_clusters

    renamed = pairs.select(
        F.col("ref_a").alias("doc_a"), F.col("ref_b").alias("doc_b")
    )
    return dedup_clusters(renamed, max_iterations).select(
        F.col("doc_id").alias("media_ref"),
        F.col("cluster_id"),
    )
