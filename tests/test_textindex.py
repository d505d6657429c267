"""Incremental text-minhash index: build/probe/append lifecycle,
replay guard, partition-bounded layout, and agreement scoring."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from claude_readability_hook_spark.operators.textindex import (
    append_to_text_minhash_index,
    build_text_minhash_index,
    text_index_dedup,
)

BASE = (
    "spark shuffles the narrow columns while the broadcast side ships "
    "whole to every executor and the scan prunes partitions early"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_probe_finds_near_dup_and_skips_novel(spark, tmp_path):
    root = str(tmp_path / "tix")
    stored = _docs(
        spark,
        [("s1", BASE), ("s2", "completely different content about cats " * 3)],
    )
    build_text_minhash_index(stored, root)
    probes = _docs(
        spark,
        [
            ("n1", BASE + " early"),  # near-dup of s1 (one word changed)
            ("n2", "unrelated prose concerning medieval pottery glazes kilns"),
        ],
    )
    hits = text_index_dedup(spark, root, probes).collect()
    by_new = {}
    for r in hits:
        by_new.setdefault(r["new_id"], []).append(r)
    assert "n1" in by_new and by_new["n1"][0]["stored_id"] == "s1"
    h = by_new["n1"][0]
    assert h["n_matching"] >= 3
    assert h["est_jaccard_micro"] == (2 * h["n_matching"] * 1_000_000 + 12) // 24
    assert "n2" not in by_new


def test_append_merging_and_replay_guard(spark, tmp_path):
    root = str(tmp_path / "tix")
    build_text_minhash_index(_docs(spark, [("s1", BASE)]), root)
    batch = _docs(spark, [("s3", "novel second batch text about rivers " * 2)])
    append_to_text_minhash_index(batch, root, mark_batch=("st", 0))
    # replay of the same batch: no new data dir, no duplicate rows
    from claude_readability_hook_spark.operators.ann_index import (
        current_manifest,
        read_index,
    )

    m1 = current_manifest(root)
    append_to_text_minhash_index(batch, root, mark_batch=("st", 0))
    m2 = current_manifest(root)
    assert m1["dirs"] == m2["dirs"] and len(m2["dirs"]) == 2
    idx = read_index(spark, root, m2)
    assert idx.filter(F.col("doc_id") == "s3").count() == 4  # one per band
    # a probe equal to the appended doc reads as a stored dup
    hits = text_index_dedup(
        spark, root, _docs(spark, [("p1", "novel second batch text about rivers " * 2)])
    ).collect()
    assert {(r["new_id"], r["stored_id"]) for r in hits} == {("p1", "s3")}
    assert all(r["n_matching"] == 12 for r in hits)


def test_same_id_replay_semantics_and_partition_bound(spark, tmp_path):
    root = str(tmp_path / "tix")
    stored = _docs(spark, [("a", BASE), ("b", BASE + " twice")])
    build_text_minhash_index(stored, root)
    # probing the stored docs themselves: default hides same-id
    hits = text_index_dedup(spark, root, stored).collect()
    assert all(r["new_id"] != r["stored_id"] for r in hits)
    inc = text_index_dedup(spark, root, stored, include_same_id=True).collect()
    assert {(r["new_id"], r["stored_id"]) for r in inc} >= {("a", "a"), ("b", "b")}
    # band_pk layout: every partition dir matches band:<pk_hex hex chars>,
    # so the directory count is bounded by n_bands * 16^pk_hex
    m = json.load(
        open(
            os.path.join(
                root,
                sorted(n for n in os.listdir(root) if n.startswith("manifest"))[-1],
            )
        )
    )
    pk_hex = int(m["pk_hex"])
    for d in m["dirs"]:
        parts = [
            p for p in os.listdir(os.path.join(root, d)) if p.startswith("band_pk=")
        ]
        assert parts
        for p in parts:
            band, hexpfx = p.split("=", 1)[1].split("%3A" if "%3A" in p else ":")
            assert band in {"0", "1", "2", "3"} and len(hexpfx) == pk_hex
            assert all(c in "0123456789abcdef" for c in hexpfx)
