"""Storage-partitioned resume join: when source and committed output
are both bucketed on doc_id with equal bucket counts, the anti-join
runs bucket-to-bucket with NO exchange — the plan shape the 100 TB
deployment note claims (README 'Shuffles that remain')."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import functions as F

from claude_readability_hook_spark.sources.catalog import TableCatalog


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_anti_join_has_no_exchange(spark, tmp_path):
    catalog = TableCatalog(spark, str(tmp_path), use_iceberg=False)
    docs = spark.range(0, 2000).select(
        F.col("id").cast("string").alias("doc_id"),
        (F.col("id") * 3).alias("payload"),
    )
    done = docs.filter(F.col("payload") % 2 == 0).select("doc_id")
    catalog.append_bucketed(docs, "src", buckets=8)
    catalog.append_bucketed(done, "done", buckets=8)

    src_t = catalog.read_bucketed("src")
    done_t = catalog.read_bucketed("done")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        anti = src_t.join(done_t, "doc_id", "left_anti")
        plan = _plan(anti)
        assert "SortMergeJoin" in plan and "LeftAnti" in plan
        assert "hashpartitioning" not in plan, plan
        # and it is correct
        assert anti.count() == docs.count() - done.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_join_needs_exchanges_for_contrast(spark, tmp_path):
    """The same join over plain parquet shuffles both sides — the
    baseline the bucketed layout removes."""
    catalog = TableCatalog(spark, str(tmp_path), use_iceberg=False)
    docs = spark.range(0, 2000).select(F.col("id").cast("string").alias("doc_id"))
    catalog.append(docs, "plain_src")
    catalog.append(docs.limit(500), "plain_done")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        anti = catalog.read("plain_src").join(
            catalog.read("plain_done"), "doc_id", "left_anti"
        )
        assert len(re.findall(r"hashpartitioning\(doc_id", _plan(anti))) >= 1
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
