"""Incremental IVF-index maintenance: batch append equivalence (build
on half + append half == probe results of build on all, same
centroids) and the streaming foreachBatch maintenance path."""

from __future__ import annotations

from pyspark.sql import functions as F

from claude_readability_hook_spark.operators.ann_index import (
    append_to_ivf_index,
    build_ivf_index,
    ivf_index_topk,
    load_ivf_centroids,
)

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _qvec(spark, vec_id=0):
    return [
        float(v)
        for v in _emb(spark).filter(F.col("vec_id") == vec_id).collect()[0]["embedding"]
    ]


def test_append_matches_full_build_given_same_centroids(spark, tmp_path):
    emb = _emb(spark)
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)

    full_path = str(tmp_path / "full")
    cents = build_ivf_index(emb, full_path, k=8, iterations=2, dims=64)

    inc_path = str(tmp_path / "inc")
    build_ivf_index(half_a, inc_path, k=8, iterations=2, dims=64, centroids=cents)
    append_to_ivf_index(half_b, inc_path)  # centroids from the artifact

    assert load_ivf_centroids(inc_path) == cents
    qvec = _qvec(spark)
    want = [
        (r["vec_id"], r["cosine"])
        for r in ivf_index_topk(
            spark, full_path, qvec, kk=10, n_probe=2, centroids=cents,
            exclude_vec_id=0,
        ).collect()
    ]
    got = [
        (r["vec_id"], r["cosine"])
        for r in ivf_index_topk(
            spark, inc_path, qvec, kk=10, n_probe=2, centroids=cents,
            exclude_vec_id=0,
        ).collect()
    ]
    assert got == want
    n_full = spark.read.parquet(full_path).count()
    n_inc = spark.read.parquet(inc_path).count()
    assert n_inc == n_full


def test_compact_after_appends_preserves_probes(spark, tmp_path):
    """Many small appends → compact → far fewer files, identical probe
    results, centroids artifact preserved."""
    import glob

    from claude_readability_hook_spark.operators.ann_index import compact_ivf_index

    emb = _emb(spark)
    path = str(tmp_path / "idx")
    cents = build_ivf_index(
        emb.filter(F.col("vec_id") < 100), path, k=4, iterations=1, dims=64
    )
    for lo in range(100, 500, 50):  # 8 small appends
        append_to_ivf_index(
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 50)), path
        )
    qvec = _qvec(spark)
    before = ivf_index_topk(
        spark, path, qvec, kk=10, n_probe=4, centroids=cents, exclude_vec_id=0
    ).collect()
    n_files_before = len(glob.glob(f"{path}/centroid_id=*/*.parquet"))

    n_files_after = compact_ivf_index(spark, path, target_rows_per_file=1_000_000)
    assert n_files_after < n_files_before
    assert load_ivf_centroids(path) == cents
    after = ivf_index_topk(
        spark, path, qvec, kk=10, n_probe=4, centroids=cents, exclude_vec_id=0
    ).collect()
    assert [(r["vec_id"], r["cosine"]) for r in after] == [
        (r["vec_id"], r["cosine"]) for r in before
    ]
    assert spark.read.parquet(path).count() == 500


def test_lsh_append_matches_full_build(spark, tmp_path):
    from claude_readability_hook_spark.operators.ann_index import (
        append_to_lsh_index,
        build_lsh_index,
        lsh_knn_join,
    )

    emb = _emb(spark)
    full = str(tmp_path / "full")
    build_lsh_index(emb, full, num_planes=6, dims=64)
    inc = str(tmp_path / "inc")
    build_lsh_index(emb.filter(F.col("vec_id") % 2 == 0), inc, num_planes=6, dims=64)
    append_to_lsh_index(
        emb.filter(F.col("vec_id") % 2 == 1), inc, num_planes=6, dims=64
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    want = lsh_knn_join(spark, full, queries, k=5, num_planes=6, dims=64).collect()
    got = lsh_knn_join(spark, inc, queries, k=5, num_planes=6, dims=64).collect()
    key = lambda rows: sorted((r["query_id"], r["rank"], r["vec_id"], r["cosine"]) for r in rows)
    assert key(got) == key(want) and len(got) > 0


def test_lsh_knn_join_uses_dpp(spark, tmp_path):
    import re

    from claude_readability_hook_spark.operators.ann_index import (
        build_lsh_index,
        lsh_knn_join,
    )

    emb = _emb(spark)
    path = str(tmp_path / "lsh")
    build_lsh_index(emb, path, num_planes=6, dims=64)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = lsh_knn_join(spark, path, queries, k=5, num_planes=6, dims=64)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", buf.getvalue())
    assert pf and "dynamicpruning" in pf.group(1)


def test_streaming_maintenance_appends_each_microbatch(spark, tmp_path):
    from claude_readability_hook_spark.streaming.index_stream import (
        maintain_ivf_index,
    )

    emb = _emb(spark)
    index_path = str(tmp_path / "idx")
    cents = build_ivf_index(
        emb.filter(F.col("vec_id") < 50), index_path, k=4, iterations=1, dims=64
    )

    # arrivals: two parquet files → two micro-batches (maxFilesPerTrigger=1)
    in_dir = str(tmp_path / "in")
    emb.filter((F.col("vec_id") >= 50) & (F.col("vec_id") < 150)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(in_dir)
    emb.filter(F.col("vec_id") >= 150).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = maintain_ivf_index(
        stream, index_path, checkpoint_dir=str(tmp_path / "ckpt"), centroids=cents
    )
    q.awaitTermination(120)

    idx = spark.read.parquet(index_path)
    assert idx.count() == emb.count()  # every vector indexed exactly once
    assert idx.select("vec_id").distinct().count() == emb.count()

    # probes see the streamed vectors
    qvec = _qvec(spark)
    got = {
        r["vec_id"]
        for r in ivf_index_topk(
            spark, index_path, qvec, kk=10, n_probe=4, centroids=cents,
            exclude_vec_id=0,
        ).collect()
    }
    assert any(v >= 50 for v in got)  # streamed vectors are probe-visible
