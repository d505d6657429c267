"""Streaming ingest scrub (streaming/scrub_stream.py): per-batch
decontamination splits clean vs quarantined docs across micro-batches,
clean output is PII-redacted, and results equal the batch operator run
on the same data (the batch/stream code-sharing contract)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_maintain_clean_corpus_matches_batch(spark, tmp_path):
    from claude_readability_hook_spark.operators.decontam import decontaminate
    from claude_readability_hook_spark.streaming.scrub_stream import (
        maintain_clean_corpus,
    )

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    rows = [
        (1, "prefix the quick brown fox jumps over and more tokens here"),
        (2, "clean doc mail me at bob@example.org for details today ok"),
        (3, "another clean document with plenty of unique token content"),
        (4, "fox jumps over the lazy dog said the quick brown announcer"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # two parquet arrival files → two micro-batches
    in_dir = str(tmp_path / "in")
    docs.filter(F.col("doc_id") <= 2).coalesce(1).write.mode("overwrite").parquet(in_dir)
    docs.filter(F.col("doc_id") >= 3).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = maintain_clean_corpus(
        stream,
        bench,
        clean_dir=str(tmp_path / "clean"),
        quarantine_dir=str(tmp_path / "quarantine"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    clean = {r["doc_id"]: r for r in spark.read.parquet(str(tmp_path / "clean")).collect()}
    quarantined = {
        r["doc_id"]: r
        for r in spark.read.parquet(str(tmp_path / "quarantine")).collect()
    }
    # batch twin on the full data decides who should be flagged
    want_flagged = {
        r["doc_id"]
        for r in decontaminate(docs, bench, n=5).collect()
        if r["contaminated"]
    }
    assert set(quarantined) == want_flagged and len(want_flagged) >= 1
    assert set(clean) == {r[0] for r in rows} - want_flagged
    assert all(q["n_hits"] >= 1 for q in quarantined.values())
    # clean output is PII-redacted on the way through
    assert "<EMAIL>" in clean[2]["text"] and "bob@" not in clean[2]["text"]


def test_stream_redact_pii_stateless(spark, tmp_path):
    from claude_readability_hook_spark.streaming.scrub_stream import (
        stream_redact_pii,
    )

    docs = spark.createDataFrame(
        [(1, "ping 10.0.0.1 and mail x@y.io")], "doc_id long, text string"
    )
    in_dir = str(tmp_path / "in")
    docs.coalesce(1).write.mode("overwrite").parquet(in_dir)
    stream = spark.readStream.schema(docs.schema).parquet(in_dir)
    out_dir = str(tmp_path / "out")
    q = (
        stream_redact_pii(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    row = spark.read.parquet(out_dir).collect()[0]
    assert "<IP>" in row["text"] and "<EMAIL>" in row["text"]


def test_maintain_clean_corpus_with_lm_gate(spark, tmp_path):
    """The model-based quality gate at ingest: a pre-trained bigram LM
    quarantines high-surprise docs (n_hits = -1 marks the LM channel),
    matching the batch lm_surprise_scores threshold decision on the
    same data."""
    from claude_readability_hook_spark.operators.lmfilter import (
        lm_surprise_scores,
        train_bigram_lm,
    )
    from claude_readability_hook_spark.streaming.scrub_stream import (
        maintain_clean_corpus,
    )

    bench = spark.createDataFrame(
        [(100, "totally unrelated benchmark five gram text nothing shares")],
        "doc_id long, text string",
    )
    rows = [
        (1, "the cat sat on the mat and the cat sat again"),
        (2, "the cat sat on the mat like the cat does"),
        (3, "zx qv wq jj kk zz pp uu yy oo surprising gibberish"),
        (4, "the mat the cat the sat on on on the mat"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    lm = train_bigram_lm(docs.filter(F.col("doc_id") <= 2), sample_mod=None)
    scores = {
        r["doc_id"]: r["lm_score"]
        for r in lm_surprise_scores(docs, lm=lm).collect()
    }
    cut = sorted(scores.values())[1]  # keep the two calmest docs

    in_dir = str(tmp_path / "in")
    docs.filter(F.col("doc_id") <= 2).coalesce(1).write.mode("overwrite").parquet(in_dir)
    docs.filter(F.col("doc_id") >= 3).coalesce(1).write.mode("append").parquet(in_dir)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = maintain_clean_corpus(
        stream,
        bench,
        clean_dir=str(tmp_path / "clean"),
        quarantine_dir=str(tmp_path / "quarantine"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        lm=lm,
        lm_max_score=cut,
    )
    q.awaitTermination(120)

    clean = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "clean")).collect()}
    quarantined = {
        r["doc_id"]: r["n_hits"]
        for r in spark.read.parquet(str(tmp_path / "quarantine")).collect()
    }
    want_rejected = {d for d, s in scores.items() if s > cut}
    assert set(quarantined) == want_rejected and len(want_rejected) == 2
    assert all(v == -1 for v in quarantined.values())  # the LM channel
    assert clean == {d for d, s in scores.items() if s <= cut}
