"""End-to-end launch test: package the library, run the job through
actual `spark-submit --py-files` (the north_rule launch mode), and
verify committed output + resumability."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pytest


def _zip_package(dest: str) -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "claude_readability_hook_spark")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_spark_submit_pyfiles_roundtrip(tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_zip = str(tmp_path / "crh_spark.zip")
    _zip_package(pkg_zip)
    out_dir = str(tmp_path / "warehouse")

    def submit(run_id: str, *extra: str) -> dict:
        proc = subprocess.run(
            [
                "spark-submit",
                "--master", "local[4]",
                "--conf", "spark.ui.enabled=false",
                "--conf", "spark.sql.shuffle.partitions=4",
                "--py-files", pkg_zip,
                os.path.join(root, "jobs", "extract_job.py"),
                "--input", "/root/testdata/sf0.001",
                "--output", out_dir,
                "--partitions", "4",
                "--run-id", run_id,
                "--from-flat",
                *extra,
            ],
            capture_output=True,
            text=True,
            timeout=480,
            cwd=str(tmp_path),  # NOT the repo root: the zip must satisfy imports
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        return json.loads(proc.stdout.strip().splitlines()[-1])

    first = submit("sub1")
    assert first["docs_in"] == 500
    assert first["docs_out"] > 450

    # resubmit: resume anti-join leaves nothing to do
    second = submit("sub2")
    assert second["docs_in"] == 0

    # staleness: an engine-version bump re-extracts everything once,
    # and the export flag writes training shards of the latest view
    shards_dir = str(tmp_path / "shards")
    third = submit(
        "sub3", "--engine-version", "3", "--export-jsonl", shards_dir,
        "--export-shard-rows", "200",
    )
    assert third["docs_in"] == 500
    assert third["export_shards"] >= 2
    import glob

    assert glob.glob(os.path.join(shards_dir, "part-*.json.gz"))

    fourth = submit("sub4", "--engine-version", "3")
    assert fourth["docs_in"] == 0
