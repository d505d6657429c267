"""Physical-plan audits: the properties that matter at 100 TB must be
visible in .explain() output — column pruning into the scan, predicate
pushdown, broadcast selection, and no shuffle before the extraction UDF
when the scan partitioning is usable."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from claude_readability_hook_spark.operators.extract import extract_spans


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_extraction_scan_prunes_to_doc_id_and_spans(spark, tmp_path):
    """The UDF input selects narrowly → parquet ReadSchema must contain
    only doc_id + spans even when the table has more columns."""
    from claude_readability_hook_spark.sources.corpus import fixtures_df

    path = str(tmp_path / "docs")
    fixtures_df(spark).write.parquet(path)
    src = spark.read.parquet(path)

    plan = _plan(extract_spans(src))
    read_schema = re.search(r"ReadSchema: (.+)", plan).group(1)
    assert "doc_id" in read_schema and "spans" in read_schema
    assert "url" not in read_schema and "host" not in read_schema
    assert "n_bytes" not in read_schema


def test_filter_pushdown_reaches_parquet(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(docs.filter(F.col("n_chars") > 100).select("doc_id"))
    assert "PushedFilters" in plan
    assert re.search(r"PushedFilters:.*GreaterThan\(n_chars,100\)", plan)


def test_small_dim_join_broadcasts(spark):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    joined = orders.join(
        F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"]
    )
    assert "BroadcastHashJoin" in _plan(joined)


def test_resume_anti_join_shape(spark):
    from claude_readability_hook_spark.operators.resume import remaining_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    done = docs.filter("doc_id % 2 = 0").select("doc_id")
    plan = _plan(remaining_documents(docs, done))
    assert "LeftAnti" in plan


def test_no_shuffle_before_udf_on_well_partitioned_source(spark):
    """run_extraction(repartition='auto') must not insert an Exchange
    between a well-partitioned source and the extraction UDF."""
    from claude_readability_hook_spark.plans.pipeline import run_extraction
    from claude_readability_hook_spark.sources.corpus import fixtures_df

    src = fixtures_df(spark).repartition(8)  # already fine-grained
    result = run_extraction(spark, src, catalog=None, num_partitions=8)
    plan = _plan(result.extracted)
    # one Exchange is the pre-existing repartition(8) of the input; the
    # pipeline itself must not add a second one before the UDF
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges <= 1, plan


def test_lsh_bucket_attached_in_row_no_self_join(spark):
    """The LSH bucket is a pure per-row expression; attaching it must
    not shuffle on vec_id. semantic_dedup_pairs' only exchanges are the
    bucket-key pair join's own (never vec_id); lsh_ann_topk is
    broadcast-only — zero exchanges."""
    from claude_readability_hook_spark.operators.similarity import (
        lsh_ann_topk,
        semantic_dedup_pairs,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    plan = _plan(semantic_dedup_pairs(emb, num_planes=6, dims=64))
    for m in re.finditer(r"Exchange hashpartitioning\(([^,]+)", plan):
        assert "vec_id" not in m.group(1), plan

    plan = _plan(lsh_ann_topk(emb, query_vec_id=0, num_planes=6, dims=64))
    assert "Exchange hashpartitioning" not in plan, plan


def test_multiprobe_recall_dominates_single_probe(spark):
    """Multi-probe scans a strict superset of the single-probe bucket,
    so recall@k vs brute force can only improve — and on sf0.01 it
    measurably does (0.0 → 0.2 at n_probe=2)."""
    from claude_readability_hook_spark.operators.similarity import (
        cosine_topk,
        lsh_ann_topk,
        lsh_ann_topk_multiprobe,
    )

    for sf, must_improve in (("0.001", False), ("0.01", True)):
        emb = spark.read.parquet(f"/root/testdata/sf{sf}/embeddings.parquet")
        truth = {r["vec_id"] for r in cosine_topk(emb, 0, 10).collect()}
        single = {
            r["vec_id"]
            for r in lsh_ann_topk(emb, 0, 10, num_planes=6, dims=64).collect()
        }
        multi = {
            r["vec_id"]
            for r in lsh_ann_topk_multiprobe(
                emb, 0, 10, n_probe=2, num_planes=6, dims=64
            ).collect()
        }
        r_single = len(truth & single)
        r_multi = len(truth & multi)
        assert r_multi >= r_single
        if must_improve:
            assert r_multi > r_single, (sf, r_single, r_multi)


def test_minhash_dedup_prepass_never_shuffles_text(spark):
    """The exact-dup pre-pass must run on narrow projections: no
    Exchange in the minhash plan may carry the text column as payload
    (formatted explain lists each Exchange's Input schema)."""
    from claude_readability_hook_spark.operators.dedup import minhash_lsh_candidates

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(minhash_lsh_candidates(docs))
    blocks = re.split(r"\n\(\d+\) ", plan)
    for b in blocks:
        if b.startswith("Exchange"):
            m = re.search(r"Input \[\d+\]: \[([^\]]*)\]", b)
            assert m and not re.search(r"\btext#", m.group(1)), b


def test_whole_stage_codegen_covers_column_exprs(spark):
    """Formatted explain marks codegen'd operators with '*'. The A2
    score is pure arithmetic → its Project must be codegen'd. (A1
    contains a higher-order filter() for Python-split word counting,
    which Catalyst evaluates outside codegen — known and acceptable:
    it's one expression, not a per-row Python call.)"""
    from claude_readability_hook_spark.functions.columns import readability_score_expr

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = docs.select(readability_score_expr(F.col("text")).alias("score"))
    assert re.search(r"\* Project", _plan(df))


def test_redact_pii_is_scan_free_rider(spark, tmp_path):
    """PII redaction must be pure codegen on the scan: zero exchanges,
    one whole-stage-codegen span over the regex chain."""
    from claude_readability_hook_spark.operators.pii import redact_pii

    docs = spark.createDataFrame(
        [(1, "mail a@b.co"), (2, "clean")], "doc_id long, text string"
    )
    path = str(tmp_path / "d")
    docs.write.parquet(path)
    plan = _plan(redact_pii(spark.read.parquet(path)))
    assert "Exchange" not in plan
    # formatted plans mark codegen stages with a leading '*'
    assert re.search(r"\* Project", plan)


def test_corpus_report_single_scan_pass(spark, tmp_path):
    """The health report reads the corpus ONCE: a single parquet scan
    feeds every metric (countDistinct adds an Expand + extra agg
    phase, and the percentile is an object agg — a few small
    exchanges of PRE-AGGREGATED rows, but never a second scan and
    never one job per metric)."""
    from claude_readability_hook_spark.operators.textstats import corpus_report

    docs = spark.createDataFrame(
        [(1, "s0", "a b c"), (2, "s1", "d e")], "doc_id long, source string, text string"
    )
    path = str(tmp_path / "d")
    docs.write.parquet(path)
    plan = _plan(corpus_report(spark.read.parquet(path)))
    # formatted output lists each node in the tree AND the detail
    # section: one scan node == one "(N) Scan parquet" detail entry
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2


def test_decontaminate_bench_side_broadcasts_and_text_never_joins(spark):
    """Corpus text must not appear past the scan: the joins carry
    n-gram hashes and (doc_id, count) only, with the benchmark side on
    broadcast."""
    from claude_readability_hook_spark.operators.decontam import decontaminate

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "g h i j k l")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(9, "a b c d e")], "doc_id long, text string")
    plan = _plan(decontaminate(docs, bench, n=5))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
