"""IVF-PQ index (operators/pq_index.py): payload compression vs the
q8 index, probe pruning, append equivalence, rerank recovering the
exact ranking, and compaction carrying the codebooks."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from claude_readability_hook_spark.operators.ann_index import (
    build_ivf_index,
    build_ivf_index_q8,
    compact_ivf_index,
    current_manifest,
    ivf_index_topk,
    ivf_probe_cids,
    read_index,
)
from claude_readability_hook_spark.operators.pq_index import (
    append_to_ivf_pq_index,
    build_ivf_pq_index,
    ivf_pq_topk,
    ivf_pq_topk_rerank,
)

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _qvec(spark, vec_id=0):
    return [
        float(v)
        for v in _emb(spark)
        .filter(F.col("vec_id") == vec_id)
        .collect()[0]["embedding"]
    ]


def _data_bytes(root: str) -> int:
    return sum(
        os.path.getsize(p)
        for p in glob.glob(f"{root}/data-*/**/*.parquet", recursive=True)
    )


def test_pq_payload_smaller_than_q8_and_prunes(spark, tmp_path):
    emb = _emb(spark)
    pq = str(tmp_path / "pq")
    cents, cbs = build_ivf_pq_index(emb, pq, k=8, iterations=2, sample_mod=4)
    assert len(cbs) == 8 and len(cbs[0]) == 16 and len(cbs[0][0]) == 8
    q8 = str(tmp_path / "q8")
    build_ivf_index_q8(emb, q8, k=8, iterations=2, centroids=cents)
    # 8 codes/vector beats int8+scale (64 B + scale) after encodings
    assert _data_bytes(pq) < 0.5 * _data_bytes(q8)

    import contextlib
    import io
    import re

    qvec = _qvec(spark)
    df = ivf_pq_topk(spark, pq, qvec, kk=10, n_probe=2, exclude_vec_id=0)
    assert len(df.collect()) == 10
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", buf.getvalue())
    assert pf and "centroid_id" in pf.group(1)  # probes prune at scan


def test_pq_append_matches_full_build(spark, tmp_path):
    emb = _emb(spark)
    full = str(tmp_path / "full")
    cents, cbs = build_ivf_pq_index(emb, full, k=8, iterations=2, sample_mod=4)
    inc = str(tmp_path / "inc")
    build_ivf_pq_index(
        emb.filter(F.col("vec_id") % 2 == 0), inc,
        k=8, iterations=2, centroids=cents, codebooks=cbs,
    )
    append_to_ivf_pq_index(emb.filter(F.col("vec_id") % 2 == 1), inc)
    qvec = _qvec(spark)
    want = [
        tuple(r)
        for r in ivf_pq_topk(
            spark, full, qvec, kk=10, n_probe=2, exclude_vec_id=0
        ).collect()
    ]
    got = [
        tuple(r)
        for r in ivf_pq_topk(
            spark, inc, qvec, kk=10, n_probe=2, exclude_vec_id=0
        ).collect()
    ]
    assert got == want
    assert read_index(spark, inc).count() == emb.count()


def test_pq_rerank_recovers_exact_ranking(spark, tmp_path):
    """Random synthetic embeddings are the PQ worst case (nothing to
    quantize), so raw ADC order drifts — the rerank path must recover
    the EXACT cosine top-k of the probed lists (the flat-index
    answer), which is the whole point of PQ+refine."""
    emb = _emb(spark)
    pq = str(tmp_path / "pq")
    cents, _cbs = build_ivf_pq_index(emb, pq, k=8, iterations=2, sample_mod=4)
    flat = str(tmp_path / "flat")
    build_ivf_index(emb, flat, k=8, iterations=2, centroids=cents)
    qvec = _qvec(spark)
    exact = [
        (r["vec_id"], r["cosine"])
        for r in ivf_index_topk(
            spark, flat, qvec, kk=10, n_probe=2, centroids=cents,
            exclude_vec_id=0,
        ).collect()
    ]
    # rerank the ENTIRE probed candidate set → must equal exact
    n_cand = read_index(spark, pq).filter(
        F.col("centroid_id").isin(ivf_probe_cids(qvec, cents, 2))
    ).count()
    got = [
        (r["vec_id"], r["cosine"])
        for r in ivf_pq_topk_rerank(
            spark, pq, emb, qvec, kk=10, n_probe=2, rerank=n_cand,
            exclude_vec_id=0,
        ).collect()
    ]
    assert got == exact
    # and a practical rerank width still recovers most of the top-10
    got50 = {
        r["vec_id"]
        for r in ivf_pq_topk_rerank(
            spark, pq, emb, qvec, kk=10, n_probe=2, rerank=50,
            exclude_vec_id=0,
        ).collect()
    }
    assert len(got50 & {v for v, _ in exact}) >= 5


def test_pq_compact_carries_codebooks(spark, tmp_path):
    emb = _emb(spark)
    pq = str(tmp_path / "pq")
    cents, cbs = build_ivf_pq_index(
        emb.filter(F.col("vec_id") < 300), pq, k=4, iterations=1, sample_mod=4
    )
    append_to_ivf_pq_index(
        emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400)), pq
    )
    qvec = _qvec(spark)
    before = [tuple(r) for r in ivf_pq_topk(spark, pq, qvec, kk=10, n_probe=2).collect()]
    compact_ivf_index(spark, pq)
    m = current_manifest(pq)
    assert m["kind"] == "ivf_pq"
    assert m["centroids"] == cents and m["codebooks"] == cbs
    after = [tuple(r) for r in ivf_pq_topk(spark, pq, qvec, kk=10, n_probe=2).collect()]
    assert after == before


def test_pq_knn_join_broadcast_knob_and_scores(spark, tmp_path):
    """Batch PQ retrieval: broadcast and shuffle-hash regimes agree
    exactly; scores match the single-query ADC path to within the
    LUT-rounding difference (the batch fold skips the per-query
    dot-table rounding — documented asymmetry)."""
    from claude_readability_hook_spark.operators.pq_index import (
        ivf_pq_knn_join,
    )

    emb = _emb(spark)
    pq = str(tmp_path / "pq")
    build_ivf_pq_index(emb, pq, k=8, iterations=2, sample_mod=4)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_pq_knn_join(spark, pq, queries, kk=10, n_probe=2)
    rows = out.collect()
    assert len(rows) == 50
    for qid in range(5):
        got = {
            r["vec_id"]: r["cosine"]
            for r in rows
            if r["query_id"] == qid
        }
        single = {
            r["vec_id"]: r["cosine"]
            for r in ivf_pq_topk(
                spark, pq, _qvec(spark, qid), kk=10, n_probe=2,
                exclude_vec_id=qid,
            ).collect()
        }
        shared = set(got) & set(single)
        assert len(shared) >= 8  # rounding can flip boundary ties only
        for v in shared:
            assert abs(got[v] - single[v]) < 5e-6

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        nb = ivf_pq_knn_join(
            spark, pq, queries, kk=10, n_probe=2, broadcast_queries=False
        )
        assert sorted(map(tuple, nb.collect())) == sorted(map(tuple, rows))
        plan = nb._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
