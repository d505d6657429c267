"""Training-shard export: size-bounded JSONL, deterministic shard
assignment, lossless round-trip of the rendered text."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from claude_readability_hook_spark.plans.pipeline import run_extraction
from claude_readability_hook_spark.sources.corpus import fixtures_df
from claude_readability_hook_spark.sources.export import export_jsonl_shards, render_text_expr


def test_export_shards_roundtrip(spark, tmp_path):
    result = run_extraction(spark, fixtures_df(spark), catalog=None, num_partitions=2)
    extracted = result.extracted
    out = str(tmp_path / "shards")
    n_shards = export_jsonl_shards(extracted, out, max_rows_per_shard=4)

    ok = extracted.filter(F.col("success"))
    n_ok = ok.count()
    assert n_shards == -(-n_ok // 4)

    back = spark.read.json(out)
    assert back.count() == n_ok
    assert set(back.columns) == {"doc_id", "title", "engine", "score", "text"}

    # text round-trips exactly (JSONL escaping is lossless)
    want = {r["doc_id"]: r["t"] for r in ok.select("doc_id", render_text_expr().alias("t")).collect()}
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got == want
    # code fences and media placeholders survive
    assert any("```" in t for t in got.values())
    media_doc = got.get("interleaved_media", "")
    assert "<media:img:1>" in media_doc and "<media:img:2>" in media_doc

    files = glob.glob(f"{out}/part-*.json.gz")
    assert len(files) >= n_shards  # one file per shard (plus writer splits)


def test_export_shard_assignment_deterministic(spark, tmp_path):
    result = run_extraction(spark, fixtures_df(spark), catalog=None, num_partitions=2)
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    export_jsonl_shards(result.extracted, a, max_rows_per_shard=4)
    export_jsonl_shards(result.extracted, b, max_rows_per_shard=4)
    ra = {tuple(r) for r in spark.read.json(a).collect()}
    rb = {tuple(r) for r in spark.read.json(b).collect()}
    assert ra == rb
