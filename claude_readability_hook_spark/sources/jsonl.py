"""JSONL document ingestion — the interchange format training
pipelines exchange (and the one sources/export.py writes).

spark.read.json with an ENFORCED schema (never inferred: a schema
inference pass is an extra full scan at 100 TB, and a drifted field
silently changes every downstream type) in PERMISSIVE mode: malformed
lines land in `_corrupt_record` instead of failing the job, and
`documents_from_jsonl` splits them into a quarantine frame — the same
poison-isolation contract as the WARC reader and the extraction UDF.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

JSONL_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("engine", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("_corrupt_record", T.StringType(), True),
    ]
)


@dataclass
class JsonlDocs:
    docs: DataFrame  # (doc_id, title, engine, score, text)
    quarantine: DataFrame  # (_corrupt_record)


def documents_from_jsonl(spark: SparkSession, path: str) -> JsonlDocs:
    """Read (gzip) JSONL shards into (docs, quarantine). Rows missing
    doc_id or text also quarantine — a training doc without content is
    corrupt whatever its JSON validity."""
    raw = (
        spark.read.schema(JSONL_DOC_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    bad = raw.filter(
        F.col("_corrupt_record").isNotNull()
        | F.col("doc_id").isNull()
        | F.col("text").isNull()
    )
    good = raw.filter(
        F.col("_corrupt_record").isNull()
        & F.col("doc_id").isNotNull()
        & F.col("text").isNotNull()
    ).drop("_corrupt_record")
    return JsonlDocs(
        docs=good,
        quarantine=bad.select(
            F.coalesce(F.col("_corrupt_record"), F.to_json(F.struct("doc_id", "text")))
            .alias("_corrupt_record")
        ),
    )
