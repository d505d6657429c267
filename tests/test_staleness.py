"""Staleness / re-extraction policy (the reference's 24h cache TTL,
lib/cache.ts:12-22, as a batch policy): resume must treat committed
rows as cache hits only while fresh — absent OR stale rows re-extract,
and bumping engine_version re-extracts exactly the older subset."""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import functions as F

from claude_readability_hook_spark.config import DEFAULT
from claude_readability_hook_spark.operators.resume import (
    fresh_extractions,
    latest_extractions,
    remaining_documents,
)
from claude_readability_hook_spark.plans.pipeline import EXTRACTED_TABLE, run_extraction
from claude_readability_hook_spark.sources.catalog import TableCatalog
from claude_readability_hook_spark.sources.corpus import fixtures_df


def test_version_staleness_selects_exactly_older_rows(spark):
    src = spark.createDataFrame([(str(i),) for i in range(10)], "doc_id string")
    done = spark.createDataFrame(
        [(str(i), 1 if i < 5 else 2) for i in range(8)],
        "doc_id string, engine_version int",
    )
    todo = {r["doc_id"] for r in remaining_documents(src, done, engine_version=2).collect()}
    # 0-4 stale (v1), 8-9 absent; 5-7 fresh
    assert todo == {"0", "1", "2", "3", "4", "8", "9"}


def test_ttl_staleness_with_pinned_now(spark):
    src = spark.createDataFrame([(str(i),) for i in range(4)], "doc_id string")
    done = spark.createDataFrame(
        [
            ("0", "2026-01-01 00:00:00"),
            ("1", "2026-01-02 23:00:00"),
            ("2", "2026-01-03 00:00:00"),
        ],
        "doc_id string, extracted_at_s string",
    ).select("doc_id", F.col("extracted_at_s").cast("timestamp").alias("extracted_at"))
    now = F.lit("2026-01-03 12:00:00").cast("timestamp")
    todo = {
        r["doc_id"]
        for r in remaining_documents(src, done, max_age_hours=24, now=now).collect()
    }
    # doc 0 aged out (2.5 days), 1 and 2 inside 24h, 3 absent
    assert todo == {"0", "3"}
    fresh = {r["doc_id"] for r in fresh_extractions(done, max_age_hours=24, now=now).collect()}
    assert fresh == {"1", "2"}


def test_pre_policy_tables_reextract_fully_when_policy_requested(spark):
    """A table written before the stamp columns existed predates the
    policy: requesting one treats every committed row as stale (they
    re-extract once and gain stamps). Without a policy, plain resume."""
    src = spark.createDataFrame([(str(i),) for i in range(4)], "doc_id string")
    done = spark.createDataFrame([("0",), ("1",)], "doc_id string")
    todo = {
        r["doc_id"]
        for r in remaining_documents(
            src, done, engine_version=2, max_age_hours=24
        ).collect()
    }
    assert todo == {"0", "1", "2", "3"}
    plain = {r["doc_id"] for r in remaining_documents(src, done).collect()}
    assert plain == {"2", "3"}


def test_cache_hits_complement_under_policy(spark):
    from claude_readability_hook_spark.operators.resume import cache_hits

    src = spark.createDataFrame([(str(i),) for i in range(10)], "doc_id string")
    done = spark.createDataFrame(
        [(str(i), 1 if i < 5 else 2) for i in range(8)],
        "doc_id string, engine_version int",
    )
    todo = {r["doc_id"] for r in remaining_documents(src, done, engine_version=2).collect()}
    hits = {r["doc_id"] for r in cache_hits(src, done, engine_version=2).collect()}
    assert todo | hits == {str(i) for i in range(10)}
    assert todo & hits == set()


def test_latest_extractions_ttl_only_table(spark):
    """extracted_at must order independently when engine_version is
    absent (TTL-only deployment)."""
    done = spark.createDataFrame(
        [("a", "2026-01-01 00:00:00", "old"), ("a", "2026-01-02 00:00:00", "new")],
        "doc_id string, extracted_at_s string, text string",
    ).select(
        "doc_id",
        F.col("extracted_at_s").cast("timestamp").alias("extracted_at"),
        "text",
    )
    rows = latest_extractions(done).collect()
    assert len(rows) == 1 and rows[0]["text"] == "new"


def test_engine_bump_reextracts_exactly_stale_subset(spark, tmp_path):
    """End-to-end through run_extraction + catalog: v1 run commits all;
    v1 rerun extracts nothing; v2 rerun re-extracts everything (all
    committed rows are v1-stale); v2 rerun again extracts nothing."""
    catalog = TableCatalog(spark, str(tmp_path / "cat"), use_iceberg=False)
    src = fixtures_df(spark)
    n_docs = src.count()

    def extracted_this_run(result):
        return (
            result.lineage.agg(F.sum("docs_in").alias("n")).collect()[0]["n"] or 0
        )

    v1 = replace(DEFAULT, engine_version=1)
    r1 = run_extraction(spark, src, catalog=catalog, cfg=v1, num_partitions=2)
    assert extracted_this_run(r1) == n_docs

    r2 = run_extraction(spark, src, catalog=catalog, cfg=v1, num_partitions=2)
    assert extracted_this_run(r2) == 0

    v2 = replace(DEFAULT, engine_version=2)
    r3 = run_extraction(spark, src, catalog=catalog, cfg=v2, num_partitions=2)
    assert extracted_this_run(r3) == n_docs

    r4 = run_extraction(spark, src, catalog=catalog, cfg=v2, num_partitions=2)
    assert extracted_this_run(r4) == 0

    # append-only table now holds v1 + v2 rows; the read-side view
    # resolves to one row per doc, preferring the newest version
    done = catalog.read(EXTRACTED_TABLE)
    assert done.count() == 2 * n_docs
    latest = latest_extractions(done)
    assert latest.count() == n_docs
    assert {r["engine_version"] for r in latest.collect()} == {2}

    # MERGE-analog compaction: rewrite keeping newest per doc; a
    # further v2 rerun still extracts nothing (resume intact)
    assert catalog.merge_latest(EXTRACTED_TABLE) == n_docs
    merged = catalog.read(EXTRACTED_TABLE)
    assert merged.count() == n_docs
    assert {r["engine_version"] for r in merged.collect()} == {2}
    r5 = run_extraction(spark, src, catalog=catalog, cfg=v2, num_partitions=2)
    assert extracted_this_run(r5) == 0


def test_compact_rewrites_small_files(spark, tmp_path):
    import glob

    catalog = TableCatalog(spark, str(tmp_path / "cat"), use_iceberg=False)
    df = spark.range(0, 1000).select(F.col("id").cast("string").alias("doc_id"))
    for _ in range(5):  # 5 appends × multiple tasks → many small files
        catalog.append(df.repartition(8), "t")
    before = len(glob.glob(str(tmp_path / "cat" / "t" / "*.parquet")))
    files = catalog.compact("t", target_rows_per_file=2500)
    after = len(glob.glob(str(tmp_path / "cat" / "t" / "*.parquet")))
    assert catalog.read("t").count() == 5000
    assert files == 2 and after <= before and after <= 4
