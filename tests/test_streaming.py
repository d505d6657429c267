"""Structured Streaming wrapper: micro-batches reuse the batch pipeline
and share its resume/lineage semantics (SURVEY §2.10)."""

from __future__ import annotations

import os

from claude_readability_hook_spark.sources.catalog import TableCatalog
from claude_readability_hook_spark.sources.corpus import fixtures_df
from claude_readability_hook_spark.streaming.stream import stream_extraction


def test_stream_extracts_and_is_replay_safe(spark, tmp_path):
    input_dir = str(tmp_path / "incoming")
    os.makedirs(input_dir)
    checkpoint = str(tmp_path / "ckpt")
    catalog = TableCatalog(spark, str(tmp_path / "tables"), use_iceberg=False)

    src = fixtures_df(spark)
    src.write.mode("append").parquet(input_dir)

    q = stream_extraction(spark, input_dir, catalog, checkpoint, num_partitions=2)
    q.awaitTermination(120)

    extracted = catalog.read("extracted")
    n = extracted.count()
    assert n == src.count()
    assert extracted.filter("doc_id = 'simple'").count() == 1

    # new file arrives; restart picks up ONLY the new docs (checkpoint +
    # anti-join): no duplicates for the old ones
    more = fixtures_df(spark).selectExpr(
        "concat('v2-', doc_id) AS doc_id", "url", "host", "n_bytes", "spans"
    )
    more.write.mode("append").parquet(input_dir)
    q2 = stream_extraction(spark, input_dir, catalog, checkpoint, num_partitions=2)
    q2.awaitTermination(120)

    extracted = catalog.read("extracted")
    assert extracted.count() == 2 * n
    assert extracted.select("doc_id").distinct().count() == 2 * n
    lineage = catalog.read("_lineage")
    assert lineage.filter("run_id LIKE 'stream-%'").count() >= 1
