#!/usr/bin/env python
"""spark-submit entry point for the multimodal curation pipeline —
the third production launch surface next to jobs/extract_job.py and
jobs/curate_job.py (north_rule mode: `spark-submit --py-files` on a
multi-executor cluster).

    cd /root/repo && zip -qr /tmp/crh_spark.zip claude_readability_hook_spark
    spark-submit --py-files /tmp/crh_spark.zip jobs/media_job.py \
        --input  /path/to/media-parquet      # MEDIA schema rows
        --output /path/to/out \
        [--synth N]            # deterministic fixture corpus instead of --input
        [--max-distance 3] [--max-bucket 50] [--partitions 16] \
        [--index-root /path/to/imghash-index]   # incremental crawl mode

Stages (every one scan-side — payload bytes are read once and never
shuffle; everything that moves afterward is narrow metadata):

  features        image/audio feature extraction (decode ladder:
                  PNG/JPEG/WAV real, others stubbed per-row)
  video demux     ISO-BMFF sample tables with dts/pts/sync offsets
                  (plain + fragmented MP4; undemuxable rows stubbed)
  image dedup     perceptual dHash+aHash → Hamming-LSH pairs →
                  connected-component clusters; keepers = cluster
                  minima; oversize buckets quarantined as metadata

Outputs under --output: features/, video_samples/, image_hashes/,
image_pairs/, image_clusters/, quarantine_buckets/ (parquet each) and
ONE JSON summary line on stdout — the extract_job/curate_job
contract."""

from __future__ import annotations

import argparse
import json


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", help="media parquet (MEDIA schema)")
    parser.add_argument("--output", required=True)
    parser.add_argument(
        "--synth",
        type=int,
        default=0,
        help="synthesize N deterministic media rows per modality kind "
        "instead of reading --input (tests/smoke; no external data)",
    )
    parser.add_argument("--max-distance", type=int, default=3)
    parser.add_argument("--max-bucket", type=int, default=50)
    parser.add_argument("--partitions", type=int, default=16)
    parser.add_argument(
        "--index-root",
        default=None,
        help="incremental mode: dedup this batch against the stored "
        "perceptual-hash index at this root (manifest snapshots), then "
        "append the surviving hashes as the next snapshot — the "
        "crawl-batch flow; first run bootstraps the index",
    )
    args = parser.parse_args()
    if not args.input and not args.synth:
        parser.error("need --input or --synth N")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("crh-spark-media").getOrCreate()

    from claude_readability_hook_spark.operators.imagededup import (
        image_dhash,
        image_dup_clusters,
        image_dup_pairs,
        image_oversize_buckets,
    )
    from claude_readability_hook_spark.operators.multimodal import (
        demux_video_samples,
        extract_media_features,
        synthesize_media_table,
    )

    if args.synth:
        n = args.synth
        media = (
            synthesize_media_table(
                spark, [f"ia:{i}" for i in range(n)], real_png_dhash=True
            )
            .unionByName(
                synthesize_media_table(
                    spark,
                    [f"ai:{i}" for i in range(n)],
                    real_png_dhash=True,
                    dhash_twin=True,
                )
            )
            .unionByName(
                synthesize_media_table(
                    spark, [f"wv:{i}" for i in range(n)], real_wav=True
                )
            )
            .unionByName(
                synthesize_media_table(
                    spark, [f"pv:{i}" for i in range(n)], real_mp4_pts=True
                )
            )
        )
    else:
        media = spark.read.parquet(args.input)
    media = media.repartition(args.partitions).persist()
    n_media = media.count()

    feats = extract_media_features(media)
    feats.write.mode("overwrite").parquet(f"{args.output}/features")

    vid = demux_video_samples(media)
    vid.write.mode("overwrite").parquet(f"{args.output}/video_samples")
    n_video_samples = (
        spark.read.parquet(f"{args.output}/video_samples")
        .filter(F.col("decode_ok") == "ok")
        .count()
    )

    hashes = image_dhash(media)
    hashes.write.mode("overwrite").parquet(f"{args.output}/image_hashes")
    hashes = spark.read.parquet(f"{args.output}/image_hashes")

    pairs = image_dup_pairs(
        hashes, max_distance=args.max_distance, max_bucket_size=args.max_bucket
    )
    pairs.write.mode("overwrite").parquet(f"{args.output}/image_pairs")
    pairs = spark.read.parquet(f"{args.output}/image_pairs")

    clusters = image_dup_clusters(pairs)
    clusters.write.mode("overwrite").parquet(f"{args.output}/image_clusters")
    clusters = spark.read.parquet(f"{args.output}/image_clusters")

    image_oversize_buckets(hashes, max_bucket_size=args.max_bucket).write.mode(
        "overwrite"
    ).parquet(f"{args.output}/quarantine_buckets")

    n_index_dups = None
    if args.index_root:
        from claude_readability_hook_spark.operators.ann_index import (
            current_manifest,
        )
        from claude_readability_hook_spark.operators.imagededup import (
            append_to_image_hash_index,
            build_image_hash_index,
            image_index_dedup,
        )

        # in-batch self-dedup first, matching the streaming gate
        # (image_stream._gate): a near-dup pair arriving in the SAME
        # batch must contribute ONE hash to the index — the stored-
        # index probe alone cannot see in-batch twins, and appending
        # both would grow the index with rows image_pairs already
        # flagged as losers
        batch_losers = clusters.filter(
            F.col("media_ref") != F.col("cluster_id")
        ).select("media_ref")
        keepers = hashes.join(batch_losers, "media_ref", "left_anti")
        if current_manifest(args.index_root) is None:
            # bootstrap: this batch's cluster keepers become snapshot
            # v1 (the losers are recorded in image_pairs above)
            build_image_hash_index(keepers, args.index_root)
            n_index_dups = 0
        else:
            # probe ALL hashes (losers included) so the dup metric sees
            # every stored near-copy; include_same_ref so a re-crawl of
            # an already-stored ref reads as a distance-0 stored dup
            idx_pairs = image_index_dedup(
                spark,
                args.index_root,
                hashes,
                max_distance=args.max_distance,
                include_same_ref=True,
            )
            idx_pairs.write.mode("overwrite").parquet(
                f"{args.output}/index_dup_pairs"
            )
            idx_pairs = spark.read.parquet(f"{args.output}/index_dup_pairs")
            n_index_dups = idx_pairs.select("new_ref").distinct().count()
            # append only the NOVEL hashes — neither dups of stored
            # images nor in-batch cluster losers may enter the index
            survivors = keepers.join(
                idx_pairs.select(F.col("new_ref").alias("media_ref")).distinct(),
                "media_ref",
                "left_anti",
            )
            append_to_image_hash_index(survivors, args.index_root)

    n_hashed = hashes.filter(F.col("decode_ok") == "ok").count()
    n_pairs = pairs.count()
    n_clustered = clusters.count()
    n_keepers = clusters.filter(F.col("media_ref") == F.col("cluster_id")).count()
    n_quarantined = (
        spark.read.parquet(f"{args.output}/quarantine_buckets").count()
    )
    media.unpersist()

    print(
        json.dumps(
            {
                "media_in": n_media,
                "images_hashed": n_hashed,
                "video_samples": n_video_samples,
                "dup_pairs": n_pairs,
                "clustered": n_clustered,
                "cluster_keepers": n_keepers,
                "dup_losers": n_clustered - n_keepers,
                "oversize_buckets": n_quarantined,
                "index_dup_refs": n_index_dups,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
