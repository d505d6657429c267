"""End-to-end launch test for the curation pipeline: package the
library, run jobs/curate_job.py through actual `spark-submit
--py-files` (the north_rule launch mode), and verify the manifest and
training shards."""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
import subprocess

import pytest

from tests.test_spark_submit import _zip_package


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_curate_job_manifest_and_shards(tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_zip = str(tmp_path / "crh_spark.zip")
    _zip_package(pkg_zip)
    out_dir = str(tmp_path / "out")

    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", pkg_zip,
            os.path.join(root, "jobs", "curate_job.py"),
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", out_dir,
            "--cap-per-source", "50",
            "--shard-rows", "100",
        ],
        capture_output=True,
        text=True,
        timeout=480,
        cwd=str(tmp_path),  # NOT the repo root: the zip must satisfy imports
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])

    assert summary["docs_in"] == 500
    assert 0 < summary["manifest_rows"] <= 500
    assert summary["train_rows"] + summary["val_rows"] == summary["manifest_rows"]
    assert summary["export_shards"] >= 1

    # manifest is a valid parquet with the expected surface
    import duckdb

    man = duckdb.sql(
        f"SELECT count(*), count(DISTINCT doc_id) FROM read_parquet('{out_dir}/manifest/*.parquet')"
    ).fetchone()
    assert man[0] == summary["manifest_rows"] == man[1]

    # shards: gzip JSONL rows, one per train doc, text non-empty
    rows = 0
    for path in glob.glob(f"{out_dir}/shards/part-*.json.gz"):
        with gzip.open(path, "rt") as fh:
            for line in fh:
                rec = json.loads(line)
                assert rec["text"] and rec["engine"] == "curate"
                rows += 1
    assert rows == summary["train_rows"]


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_curate_job_scrub_stages(tmp_path):
    """The round-4 scrub stages through the real launch surface:
    --decontaminate drops docs overlapping the benchmark set,
    --scrub-spans removes corpus-frequent spans, --redact-pii rewrites
    exported text — all in one spark-submit run."""
    import duckdb

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_zip = str(tmp_path / "crh_spark.zip")
    _zip_package(pkg_zip)
    out_dir = str(tmp_path / "out")
    bench = str(tmp_path / "bench.parquet")
    duckdb.sql(
        "COPY (SELECT doc_id, text FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet') "
        "WHERE doc_id % 50 = 0) TO '" + bench + "' (FORMAT PARQUET)"
    )

    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", pkg_zip,
            os.path.join(root, "jobs", "curate_job.py"),
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", out_dir,
            "--cap-per-source", "500",
            "--shard-rows", "200",
            "--decontaminate", bench,
            "--redact-pii",
            "--scrub-spans", "2",
            "--domain-filter",
            "--domain-blocklist", "src0",
            "--boilerplate-filter", "0.5",
            "--line-dup-filter", "0.5",
        ],
        capture_output=True,
        text=True,
        timeout=480,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    # the benchmark docs ARE corpus docs, so at least they get dropped
    assert summary["contaminated_dropped"] >= 1
    # --domain-filter with src0 blocklisted: every surviving src0 doc
    # leaves the manifest at the domain gate
    assert summary["domain_dropped"] >= 1
    # wiring check for the r7 gates: the word-soup corpus has no
    # cross-page templates and no newlines, so both gates pass
    # everything — the flags parse, the stages run, the counts report
    assert summary["boiler_dropped"] == 0
    assert summary["linedup_dropped"] == 0
    assert summary["manifest_rows"] + summary["contaminated_dropped"] <= 500
    rows = 0
    for path in glob.glob(f"{out_dir}/shards/part-*.json.gz"):
        with gzip.open(path, "rt") as fh:
            for line in fh:
                rec = json.loads(line)  # text may be "" after span scrub
                assert rec["engine"] == "curate"
                rows += 1
    assert rows == summary["train_rows"]


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_curate_job_learned_tokenizer_pack(tmp_path):
    """--pack + --tokenizer-root through the real launch surface:
    first run trains and PUBLISHES the merge artifact, exports packed
    learned-BPE symbol shards (every non-final pack exactly seq_len
    symbols, symbols include the end-of-word marker)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_zip = str(tmp_path / "crh_spark.zip")
    _zip_package(pkg_zip)
    out_dir = str(tmp_path / "out")
    tok_root = str(tmp_path / "tok")

    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", pkg_zip,
            os.path.join(root, "jobs", "curate_job.py"),
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", out_dir,
            "--pack", "64",
            "--tokenizer-root", tok_root,
            "--bpe-merges", "4",
        ],
        capture_output=True,
        text=True,
        timeout=480,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["packed_sequences"] > 0 and summary["seq_len"] == 64
    # artifact published
    assert any(
        n.startswith("manifest-v") for n in os.listdir(tok_root)
    )
    # packed shards: learned symbols, full packs but shard-final ones
    import collections

    # Hive layout: the shard key lives in the directory name
    # (shard=<val>/ — one file per shard), records carry the rest
    per_shard = collections.defaultdict(list)
    for path in glob.glob(f"{out_dir}/packed/shard=*/part-*.json.gz"):
        shard = os.path.basename(os.path.dirname(path)).split("=", 1)[1]
        with gzip.open(path, "rt") as fh:
            for line in fh:
                per_shard[shard].append(json.loads(line))
    assert per_shard
    assert all(
        len(glob.glob(f"{os.path.dirname(p)}/part-*.json.gz")) == 1
        for p in glob.glob(f"{out_dir}/packed/shard=*/part-*.json.gz")
    )
    for shard, recs in per_shard.items():
        last = max(r["pack_id"] for r in recs)
        for r in recs:
            assert len(r["tokens"]) == r["n"]
            if r["pack_id"] != last:
                assert r["n"] == 64
    # end-of-word marker convention: the symbols are LEARNED-BPE output
    from claude_readability_hook_spark.operators.bpetrain import END_OF_WORD

    any_tokens = next(iter(per_shard.values()))[0]["tokens"]
    assert any(t.endswith(END_OF_WORD) for t in any_tokens)


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_curate_job_gopher_and_c4_gates(tmp_path):
    """--gopher-filter and --c4-filter through the real launch surface:
    a crafted input with three doc classes — clean prose (passes both),
    ellipsis-terminated lines (fails exactly the Gopher line rule while
    C4 keeps them), and brace pages (pass Gopher, fail exactly the C4
    brace gate) — so each drop count is attributable to one gate."""
    import duckdb

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_zip = str(tmp_path / "crh_spark.zip")
    _zip_package(pkg_zip)
    out_dir = str(tmp_path / "out")
    inp = str(tmp_path / "docs.parquet")

    good_line = "the quick brown fox jumps over that lazy sleeping dog."
    rows = []
    for i in range(10):
        # 7 terminal-punctuated >=5-word lines of stopword-bearing
        # English prose → passes Gopher AND C4
        rows.append(
            (
                i,
                "\n".join([good_line] * 6)
                + f"\nunique{i} section of the story here.",
                "srcA",
            )
        )
    for i in range(10, 20):
        # every line ends '...' → gopher ellipsis_line_frac 1.0 > 0.3;
        # C4 would KEEP these (terminal '.', >=3 sentence marks)
        rows.append(
            (
                i,
                "\n".join([good_line[:-1] + "..."] * 6)
                + f"\nunique{i} the end of that story...",
                "srcA",
            )
        )
    for i in range(20, 30):
        # one brace word: passes Gopher (alpha frac 69/70 >= 0.8),
        # fails exactly the C4 brace page gate
        rows.append(
            (
                i,
                "\n".join([good_line] * 6)
                + f"\nunique{i} part of the story here {{ told.",
                "srcA",
            )
        )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR, source VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    con.execute(f"COPY t TO '{inp}' (FORMAT PARQUET)")

    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", pkg_zip,
            os.path.join(root, "jobs", "curate_job.py"),
            "--input", inp,
            "--output", out_dir,
            "--cap-per-source", "500",
            "--shard-rows", "200",
            "--gopher-filter",
            "--c4-filter",
        ],
        capture_output=True,
        text=True,
        timeout=480,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["gopher_dropped"] == 10
    assert summary["c4_dropped"] == 10
    assert summary["manifest_rows"] == 10


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_curate_job_mixture_report(tmp_path):
    """--mixture-report with --dsir-target-lang: the mixture/ parquet
    carries the token-budget view — DoReMi doc-mass shares × byte-BPE
    tokens-per-doc, token_share summing to 1."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_zip = str(tmp_path / "crh_spark.zip")
    _zip_package(pkg_zip)
    out_dir = str(tmp_path / "out")

    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", pkg_zip,
            os.path.join(root, "jobs", "curate_job.py"),
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", out_dir,
            "--manifest-only",
            "--dsir-target-lang", "en",
            "--mixture-report",
        ],
        capture_output=True,
        text=True,
        timeout=480,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    import duckdb

    rows = duckdb.sql(
        f"SELECT domain, n_docs, mixture_share, tokens_per_doc, token_share "
        f"FROM read_parquet('{out_dir}/mixture/*.parquet')"
    ).fetchall()
    assert rows
    assert all(r[3] > 0 for r in rows)  # every lang has tokens/doc
    assert abs(sum(r[4] for r in rows) - 1.0) < 1e-4
    # a language whose tokenizer charges more pieces per doc gains
    # token budget relative to its doc-mass share — so the two share
    # columns must actually differ somewhere (the adjustment is real)
    assert any(abs(r[2] - r[4]) > 1e-6 for r in rows)


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_curate_job_unigram_pack(tmp_path):
    """--tokenizer-family unigram trains + publishes the unigram
    artifact on first run and exports piece-stream packed shards."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_zip = str(tmp_path / "crh_spark.zip")
    _zip_package(pkg_zip)
    out_dir = str(tmp_path / "out")
    tok_root = str(tmp_path / "tok")

    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", pkg_zip,
            os.path.join(root, "jobs", "curate_job.py"),
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", out_dir,
            "--cap-per-source", "30",
            "--pack", "64",
            "--tokenizer-root", tok_root,
            "--tokenizer-family", "unigram",
        ],
        capture_output=True,
        text=True,
        timeout=480,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["packed_sequences"] >= 1
    # the artifact was published under the manifest protocol
    assert glob.glob(f"{tok_root}/manifest-*.json")
    # packs are JSONL with 64-piece streams + doc boundaries
    rows = 0
    for path in glob.glob(f"{out_dir}/packed/*/part-*.json.gz"):
        with gzip.open(path, "rt") as fh:
            for line in fh:
                rec = json.loads(line)
                assert len(rec["tokens"]) == rec["n"] <= 64
                assert rec["docs"]
                rows += 1
    assert rows == summary["packed_sequences"]
