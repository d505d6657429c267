"""Table-format seam: Iceberg when available, partitioned Parquet fallback.

The design target is Iceberg (`df.writeTo(...).append()` with atomic
snapshot commits — the durability the reference's in-memory LRU lacks,
SURVEY §4). The sandbox has no iceberg-spark-runtime jar, so the same
API is served by a Parquet directory + an idempotent overwrite mode;
the pipeline code never forks on the format (SURVEY §7.2 watch-list).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True only when an Iceberg catalog is actually CONFIGURED —
    classes on the classpath are not enough (a stock distribution can
    ship the jar while `writeTo(name)` still has no catalog to resolve
    the table against)."""
    conf = spark.conf
    try:
        if "iceberg" in conf.get("spark.sql.catalog.spark_catalog", "").lower():
            return True
    except Exception:
        pass
    try:
        extensions = conf.get("spark.sql.extensions", "") or ""
        if "IcebergSparkSessionExtensions" not in extensions:
            return False
        # any named catalog configured as Iceberg?
        all_conf = spark.sparkContext.getConf().getAll()
        return any(
            k.startswith("spark.sql.catalog.") and "iceberg" in str(v).lower()
            for k, v in all_conf
        )
    except Exception:
        return False


class TableCatalog:
    """Thin writer/reader seam keyed by logical table name."""

    def __init__(self, spark: SparkSession, root: str, use_iceberg: bool | None = None):
        self.spark = spark
        self.root = root
        self.use_iceberg = iceberg_available(spark) if use_iceberg is None else use_iceberg

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        if self.use_iceberg:
            return self.spark.catalog.tableExists(name)
        from . import fs as fsio

        path = self._path(name)
        if fsio.exists(os.path.join(path, "_SUCCESS"), self.spark):
            return True
        return any(
            f.endswith(".parquet") for f in fsio.list_names(path, self.spark)
        )

    def read(self, name: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.table(name)
        # mergeSchema: an upgraded writer appends files with NEW columns
        # (engine_version/extracted_at stamps) next to pre-upgrade files;
        # without merging, the schema comes from one arbitrary footer and
        # staleness/latest semantics become nondeterministic. Old rows
        # read NULL stamps, which the staleness filters treat as stale —
        # deterministic either way. (Iceberg evolves schema natively.)
        return self.spark.read.option("mergeSchema", "true").parquet(self._path(name))

    def append(self, df: DataFrame, name: str) -> None:
        """Atomic-enough append: Spark's parquet committer writes to a
        staging dir and renames on success; _SUCCESS marks the commit.
        With Iceberg this is a snapshot append."""
        if self.use_iceberg:
            df.writeTo(name).append()
        else:
            df.write.mode("append").parquet(self._path(name))

    def overwrite(self, df: DataFrame, name: str) -> None:
        if self.use_iceberg:
            df.writeTo(name).createOrReplace()
        else:
            df.write.mode("overwrite").parquet(self._path(name))

    # -- maintenance: the Iceberg MERGE/rewrite analogs ---------------------

    def _staged_replace(self, df: DataFrame, name: str) -> DataFrame:
        """Durably rewrite `name` with `df`'s rows: write the FULL
        replacement to a staging path first (reading from the live
        table — the lazy plan scans the original files untouched), then
        swap directories atomically (rename, rename). At no point is
        the only copy of committed data an executor-local checkpoint or
        a half-deleted directory: a crash before the swap leaves the
        live table intact; a crash between the two renames leaves the
        data in `<path>.old-*`, recoverable by hand. Iceberg does this
        natively (createOrReplace = snapshot swap). Returns the
        re-read replacement. (ADVICE r2: mode('overwrite') deleted the
        live table before the new write committed. ADVICE r3: the swap
        now runs through the Hadoop FileSystem API — sources/fs — so
        it works wherever the table lives, not only on a driver-
        mounted POSIX path. Residual caveat: directory rename on S3A
        is a copy, not atomic — on object stores the Iceberg seam's
        createOrReplace, or the manifest protocol operators/ann_index
        uses, is the committed answer; this parquet fallback is for
        HDFS/local where rename IS atomic.)"""
        if self.use_iceberg:
            df.writeTo(name).createOrReplace()
            return self.read(name)
        import uuid

        from . import fs as fsio

        final = self._path(name)
        token = uuid.uuid4().hex[:8]
        staging = f"{final}.staging-{token}"
        df.write.mode("overwrite").parquet(staging)  # full commit + _SUCCESS
        old = f"{final}.old-{token}"
        if fsio.exists(final, self.spark):
            fsio.rename(final, old, self.spark)
        fsio.rename(staging, final, self.spark)
        fsio.delete(old, recursive=True, spark=self.spark)
        return self.read(name)

    def merge_latest(self, name: str, key: str = "doc_id") -> int:
        """Compact re-extraction appends: rewrite the table keeping only
        the newest row per key (operators.resume.latest_extractions
        order). The Iceberg analog is MERGE INTO / rewrite_data_files;
        the parquet seam writes the replacement to a staging path and
        swaps directories (no window where committed data exists only
        in memory). Returns the surviving row count."""
        from ..operators.resume import latest_extractions

        replaced = self._staged_replace(latest_extractions(self.read(name)), name)
        return replaced.count()

    def compact(self, name: str, target_rows_per_file: int = 1_000_000) -> int:
        """Small-file management: rewrite the table into
        ceil(rows/target) files (the operational fix for long append
        histories; Iceberg analog rewrite_data_files). Returns the new
        file count. Same staged-swap durability as merge_latest; the
        sizing count scans the live table once before the rewrite (at
        scale, table stats replace it)."""
        df = self.read(name)
        n = df.count()
        files = max(1, -(-n // target_rows_per_file))
        self._staged_replace(df.repartition(files), name)
        return files

    # -- bucketed variant: the storage-partitioned-join seam ---------------
    #
    # At 10^12 docs the resume anti-join (src ⋈ committed-output on
    # doc_id) is the one unavoidable big join; when BOTH sides are
    # bucketed on doc_id with the same bucket count, Spark joins
    # bucket-to-bucket with NO exchange (Iceberg: bucket(N, doc_id)
    # partition transform + storage-partitioned joins). The parquet
    # fallback uses session-catalog bucketed tables — bucket metadata
    # lives in the catalog, so cross-session persistence of bucketing
    # needs a real metastore/Iceberg; within a job it is the same plan.

    def table_ident(self, name: str) -> str:
        return f"crh_{name}"

    def append_bucketed(
        self, df: DataFrame, name: str, buckets: int = 16, bucket_col: str = "doc_id"
    ) -> None:
        if self.use_iceberg:
            df.writeTo(name).append()  # table created with bucket transform
            return
        (
            df.write.mode("append")
            .format("parquet")
            .option("path", self._path(name + "_bucketed"))
            .bucketBy(buckets, bucket_col)
            .sortBy(bucket_col)
            .saveAsTable(self.table_ident(name))
        )

    def read_bucketed(self, name: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.table(name)
        return self.spark.read.table(self.table_ident(name))
