"""jobs/media_job.py end-to-end through REAL spark-submit — the third
launch surface (north_rule: --py-files, multi-executor style): synth
corpus in, parquet stages + one JSON summary line out, planted twins
clustered."""

from __future__ import annotations

import json
import os
import subprocess
import shutil
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_media_job_end_to_end(tmp_path):
    zip_path = tmp_path / "crh_spark.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        pkg = os.path.join(REPO, "claude_readability_hook_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    out = tmp_path / "out"
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zip_path),
            os.path.join(REPO, "jobs", "media_job.py"),
            "--synth", "6",
            "--output", str(out),
            "--partitions", "4",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(tmp_path),  # NOT the repo root: the zip must supply the pkg
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    # 6 twins + 6 bases + 6 wavs + 6 videos
    assert summary["media_in"] == 24
    assert summary["images_hashed"] == 12
    assert summary["video_samples"] > 0
    # every planted (ia:i, ai:i) twin pair found; losers deduped away
    assert summary["dup_pairs"] >= 6
    assert summary["clustered"] >= 12 - summary["cluster_keepers"]
    assert summary["dup_losers"] >= 6
    for d in (
        "features",
        "video_samples",
        "image_hashes",
        "image_pairs",
        "image_clusters",
        "quarantine_buckets",
    ):
        assert (out / d).exists(), d

    # incremental mode: first run bootstraps the stored hash index,
    # second run (same batch) finds every image already stored and
    # appends nothing
    def run_indexed(outdir):
        p = subprocess.run(
            [
                "spark-submit",
                "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=8",
                "--conf", "spark.ui.enabled=false",
                "--py-files", str(zip_path),
                os.path.join(REPO, "jobs", "media_job.py"),
                "--synth", "6",
                "--output", str(outdir),
                "--partitions", "4",
                "--index-root", str(tmp_path / "imgidx"),
            ],
            capture_output=True, text=True, timeout=420, cwd=str(tmp_path),
        )
        assert p.returncode == 0, p.stderr[-4000:]
        return json.loads(
            [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
        )

    s1 = run_indexed(tmp_path / "out_idx1")
    assert s1["index_dup_refs"] == 0  # bootstrap snapshot
    s2 = run_indexed(tmp_path / "out_idx2")
    assert s2["index_dup_refs"] == 12  # every image already stored
    assert (tmp_path / "out_idx2" / "index_dup_pairs").exists()
