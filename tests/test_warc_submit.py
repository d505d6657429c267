"""spark-submit --from-warc: crawl segments straight into the
production extraction job."""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import pytest

from claude_readability_hook_spark.sources.warc import synthesize_warc
from tests.test_spark_submit import _zip_package

HTML = (
    "<html><head><title>T{i}</title></head><body><article><h1>T{i}</h1>"
    "<p>Warc document {i} paragraph content with enough words to keep.</p>"
    "</article></body></html>"
)


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_extract_job_from_warc(tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_zip = str(tmp_path / "crh_spark.zip")
    _zip_package(pkg_zip)
    warc_dir = tmp_path / "segments"
    warc_dir.mkdir()
    for s in range(2):
        docs = [
            (f"https://example.com/{s}/{i}", HTML.format(i=f"{s}-{i}"))
            for i in range(5)
        ]
        (warc_dir / f"seg-{s}.warc").write_bytes(
            synthesize_warc(docs, member_gzip=(s == 1))
        )
    out_dir = str(tmp_path / "warehouse")

    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", pkg_zip,
            os.path.join(root, "jobs", "extract_job.py"),
            "--input", str(warc_dir),
            "--output", out_dir,
            "--partitions", "4",
            "--from-warc",
        ],
        capture_output=True,
        text=True,
        timeout=480,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["docs_in"] == 10
    assert summary["docs_out"] == 10

    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{out_dir}/extracted/*.parquet')"
    ).fetchone()[0]
    assert n == 10
