"""Streaming extraction: readStream → foreachBatch(batch pipeline).

The reference's 'stream' is just HTTP request arrival (SURVEY §2.10);
watermarks/event-time windows are not required. A streaming variant is
still useful operationally (continuous ingest of freshly crawled
docs), and reuses the batch code 1:1 via foreachBatch — each
micro-batch runs the identical extraction plan and commits through the
same catalog seam, so resume/lineage semantics are shared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..config import DEFAULT, EngineConfig
from ..plans.pipeline import run_extraction
from ..schemas import DOCUMENTS
from ..sources.catalog import TableCatalog


def stream_extraction(
    spark: SparkSession,
    input_path: str,
    catalog: TableCatalog,
    checkpoint_dir: str,
    cfg: EngineConfig = DEFAULT,
    num_partitions: int | None = None,
    fmt: str = "parquet",
) -> StreamingQuery:
    """Watch input_path for new span files; extract each micro-batch.

    Exactly-once across restarts = streaming checkpoint (offsets) +
    the pipeline's own doc_id anti-join (duplicate micro-batch replays
    dedupe against committed output)."""
    stream = (
        spark.readStream.format(fmt)
        .schema(DOCUMENTS)
        .option("maxFilesPerTrigger", 16)
        .load(input_path)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        run_extraction(
            spark,
            batch_df,
            catalog=catalog,
            cfg=cfg,
            num_partitions=num_partitions,
            run_id=f"stream-{batch_id}",
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
