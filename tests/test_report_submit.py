"""End-to-end launch test for the corpus health report: package the
library, run jobs/report_job.py through actual `spark-submit
--py-files`, and verify the governance JSON."""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import pytest

from tests.test_spark_submit import _zip_package


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_report_job(tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_zip = str(tmp_path / "crh_spark.zip")
    _zip_package(pkg_zip)
    out_dir = str(tmp_path / "out")

    import duckdb

    con = duckdb.connect()
    edges = str(tmp_path / "edges.parquet")
    con.execute("CREATE TABLE e (src VARCHAR, dst VARCHAR)")
    con.executemany(
        "INSERT INTO e VALUES (?, ?)",
        [("a.com", "hub.com"), ("b.com", "hub.com"), ("hub.com", "a.com")],
    )
    con.execute(f"COPY e TO '{edges}' (FORMAT PARQUET)")
    # a synthesized frontier_job output: fetcher-partitioned plan +
    # a retry plan (the layouts frontier_job writes)
    fr = str(tmp_path / "frontier")
    os.makedirs(f"{fr}/plan/fetcher_id=0", exist_ok=True)
    os.makedirs(f"{fr}/plan/fetcher_id=3", exist_ok=True)
    con.execute("CREATE TABLE p0 (url VARCHAR, host VARCHAR, slot BIGINT, fetch_offset_ms BIGINT, keep BOOLEAN)")
    con.executemany(
        "INSERT INTO p0 VALUES (?, ?, ?, ?, ?)",
        [(f"https://a/{i}", "a", i, i * 1000, i < 8) for i in range(10)],
    )
    con.execute(f"COPY p0 TO '{fr}/plan/fetcher_id=0/part.parquet' (FORMAT PARQUET)")
    con.execute("CREATE TABLE p3 (url VARCHAR, host VARCHAR, slot BIGINT, fetch_offset_ms BIGINT, keep BOOLEAN)")
    con.executemany(
        "INSERT INTO p3 VALUES (?, ?, ?, ?, ?)",
        [(f"https://b/{i}", "b", i, i * 2000, True) for i in range(5)],
    )
    con.execute(f"COPY p3 TO '{fr}/plan/fetcher_id=3/part.parquet' (FORMAT PARQUET)")
    os.makedirs(f"{fr}/retry_plan", exist_ok=True)
    con.execute("CREATE TABLE rt (url VARCHAR, attempts BIGINT, last_status BIGINT, verdict VARCHAR, retry_after_ms BIGINT)")
    con.executemany(
        "INSERT INTO rt VALUES (?, ?, ?, ?, ?)",
        [("https://a/r1", 1, 503, "retry", 2000),
         ("https://a/r2", 2, 500, "retry", 4000)],
    )
    con.execute(f"COPY rt TO '{fr}/retry_plan/part.parquet' (FORMAT PARQUET)")

    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", pkg_zip,
            os.path.join(root, "jobs", "report_job.py"),
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", out_dir,
            "--edges", edges,
            "--frontier", fr,
        ],
        capture_output=True,
        text=True,
        timeout=480,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["volume"]["n_docs"] == 500
    assert report["volume"]["total_tokens"] > 0
    for gate in ("gopher", "c4", "line_dup"):
        q = report["quality"][gate]
        assert q["n"] == 500
        assert 0 <= q["kept"] <= 500
    # word-soup: no required stopwords → gopher drops all; no terminal
    # punctuation → c4 drops all; single-line docs → line_dup keeps all
    assert report["quality"]["gopher"]["kept"] == 0
    assert report["quality"]["c4"]["kept"] == 0
    assert report["quality"]["line_dup"]["kept"] == 500
    assert report["domains"] is None  # corpus has no host column
    # link authority: hub and its sole target trade rank every power
    # iteration (a near-2-cycle), so assert the oscillation-proof
    # property — both dominate the inflow-less leaf
    assert report["authority"]["n_domains"] == 3
    top2 = {t["domain"] for t in report["authority"]["top"][:2]}
    assert top2 == {"hub.com", "a.com"}
    assert report["authority"]["top"][2]["domain"] == "b.com"
    fr_rep = report["frontier"]
    assert fr_rep["planned"] == 15 and fr_rep["kept"] == 13
    assert fr_rep["hosts"] == 2 and fr_rep["fetchers"] == 2
    assert fr_rep["max_slot"] == 9
    assert fr_rep["retry"]["n"] == 2
    assert fr_rep["retry"]["backoff_p50_ms"] in (2000, 4000)
    assert fr_rep["retry"]["backoff_max_ms"] == 4000
    # the persisted governance document matches stdout
    import glob

    files = glob.glob(f"{out_dir}/report.json/part-*")
    assert files
    with open(files[0]) as fh:
        assert json.loads(fh.read()) == report
