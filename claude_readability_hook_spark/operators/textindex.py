"""Incremental text-minhash index: the stored near-duplicate store an
incremental crawl dedups NEW documents against without rescanning
history — the text twin of the image-hash index (imagededup.py) on the
same manifest-snapshot protocol (exclusive-create publish, merging
append, snapshot GC, applied-batch replay guard).

Index rows are (band_pk, band_idx, band_key, doc_id, sig): the LSH
band keys of each stored doc's minhash signature plus the full
signature for agreement scoring at probe time. `band_pk` is the
partition column — band_idx plus the band key's first pk_hex hex chars,
bounding the directory count to n_bands × 16^pk_hex regardless of
corpus size (partitioning by the raw md5 band_key would mint one directory
per bucket — millions of tiny dirs at crawl scale; the image index
can partition by its raw band_key only because that key space is
already small).

Probe plan (the ivf/image discipline): the new batch computes its
band rows in-row; its DISTINCT band_pk values — a documented tiny
driver collect, ≤ n_bands × 16^pk_hex values by construction — become a
static partition filter on the snapshot scan (DPP does not descend a
Union), the banded equi-join carries both signatures in-row, and the
estimated-Jaccard gate (matching minhash components / num_hashes, in
exact integer micro-units) never re-touches the store. Stored text
never enters the index at all.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import minhash_signature

TEXTINDEX_NUM_HASHES = 12
TEXTINDEX_BAND_SIZE = 3
TEXTINDEX_PK_HEX = 1  # band_key hex chars in the partition key


def _text_band_rows(
    df: DataFrame,
    num_hashes: int = TEXTINDEX_NUM_HASHES,
    band_size: int = TEXTINDEX_BAND_SIZE,
    text_col: str = "text",
    n: int = 3,
    pk_hex: int = TEXTINDEX_PK_HEX,
) -> DataFrame:
    """(band_pk, band_idx, band_key, doc_id, sig): one row per (doc,
    band); sig is the full minhash signature array for probe-time
    agreement scoring."""
    nbands = num_hashes // band_size
    sig = minhash_signature(df, num_hashes, text_col, n)
    sig_arr = F.array(*[F.col(f"s{i}") for i in range(num_hashes)])
    band_cols = [
        F.md5(
            F.concat_ws(
                "|",
                *[
                    F.col(f"s{i}").cast("string")
                    for i in range(b * band_size, (b + 1) * band_size)
                ],
            )
        ).alias(f"b{b}")
        for b in range(nbands)
    ]
    with_bands = sig.select("doc_id", sig_arr.alias("sig"), *band_cols)
    stack_args = ", ".join(f"{b}, b{b}" for b in range(nbands))
    bands = with_bands.selectExpr(
        "doc_id",
        "sig",
        f"stack({nbands}, {stack_args}) AS (band_idx, band_key)",
    )
    return bands.select(
        F.concat_ws(
            ":",
            F.col("band_idx").cast("string"),
            F.substring("band_key", 1, pk_hex),
        ).alias("band_pk"),
        "band_idx",
        "band_key",
        "doc_id",
        "sig",
    )


def build_text_minhash_index(
    df: DataFrame,
    root: str,
    num_hashes: int = TEXTINDEX_NUM_HASHES,
    band_size: int = TEXTINDEX_BAND_SIZE,
    text_col: str = "text",
    n: int = 3,
    retain_snapshots: int = 1,
    mark_batch: tuple[str, int] | None = None,
    pk_hex: int = TEXTINDEX_PK_HEX,
) -> None:
    """Materialize the index at `root` under a fresh snapshot via the
    shared manifest protocol. ~num_hashes·8 + 3 band rows per doc;
    document text never enters the store. pk_hex sizes the partition
    fan-out (n_bands × 16^pk_hex dirs): 1 → 64 dirs (right up to ~TB
    of index rows), 2 → 1024 (the 100 TB setting — finer probe
    pruning once every dir still holds many files)."""
    from .ann_index import _gc_previous_snapshots, _new_data_dir, _publish_manifest

    ddir = _new_data_dir()
    # repartition on the partition column first: without it every
    # input task writes a file into every band_pk dir (tasks × 1024
    # small files — the classic partitionBy explosion); with it each
    # dir gets files from exactly one task
    _text_band_rows(df, num_hashes, band_size, text_col, n, pk_hex).repartition(
        "band_pk"
    ).write.mode("overwrite").partitionBy("band_pk").parquet(
        posixpath.join(root, ddir)
    )
    published = dict(
        kind="txtminhash",
        dirs=[ddir],
        num_hashes=num_hashes,
        band_size=band_size,
        shingle_n=n,
        pk_hex=pk_hex,
    )
    if mark_batch is not None:
        published["applied"] = {mark_batch[0]: mark_batch[1]}
    published["version"] = _publish_manifest(root, published)
    _gc_previous_snapshots(root, published, retain=retain_snapshots)


def append_to_text_minhash_index(
    df: DataFrame,
    root: str,
    text_col: str = "text",
    mark_batch: tuple[str, int] | None = None,
) -> None:
    """Incremental maintenance: band the new batch with the SNAPSHOT'S
    parameters (they ride the manifest) and commit a new data dir via
    a MERGING publish (lost-update-safe, the append_to_ivf_index
    discipline); `mark_batch` makes a foreachBatch replay skip the
    re-append (see imagededup.applied_batch)."""
    from .ann_index import _new_data_dir, _publish_manifest, current_manifest
    from .imagededup import applied_batch

    m = current_manifest(root)
    if m is None:
        raise FileNotFoundError(f"no published index snapshot under {root}")
    if mark_batch is not None and applied_batch(root, mark_batch[0]) >= mark_batch[1]:
        return
    ddir = _new_data_dir()
    _text_band_rows(
        df,
        int(m["num_hashes"]),
        int(m["band_size"]),
        text_col,
        int(m["shingle_n"]),
        int(m.get("pk_hex", TEXTINDEX_PK_HEX)),
    ).repartition("band_pk").write.mode("overwrite").partitionBy(
        "band_pk"
    ).parquet(posixpath.join(root, ddir))

    def _body(cur):
        base = cur or m
        out = {
            k: base[k]
            for k in ("kind", "num_hashes", "band_size", "shingle_n")
        }
        out["pk_hex"] = base.get("pk_hex", TEXTINDEX_PK_HEX)
        out["dirs"] = list(base.get("dirs", [])) + [ddir]
        applied = dict(base.get("applied", {}))
        if mark_batch is not None:
            applied[mark_batch[0]] = mark_batch[1]
        if applied:
            out["applied"] = applied
        return out

    _publish_manifest(root, _body)


def text_index_dedup(
    spark: SparkSession,
    root: str,
    new_docs: DataFrame,
    min_matches: int | None = None,
    text_col: str = "text",
    broadcast_queries: bool = True,
    version: int | None = None,
    include_same_id: bool = False,
) -> DataFrame:
    """(new_id, stored_id, n_matching, est_jaccard_micro): near-dups
    of the NEW batch against the STORED index — any banded collision
    scored by minhash agreement (n matching signature components of
    num_hashes; est Jaccard in half-up micro-units), gated at
    min_matches (default: band_size, one full band — the LSH
    guarantee floor). include_same_id mirrors the image probe's
    replay semantics."""
    from .ann_index import current_manifest, read_index

    m = current_manifest(root, version)
    if m is None:
        raise FileNotFoundError(f"no published index snapshot under {root}")
    num_hashes = int(m["num_hashes"])
    band_size = int(m["band_size"])
    if min_matches is None:
        min_matches = band_size
    probe = _text_band_rows(
        new_docs,
        num_hashes,
        band_size,
        text_col,
        int(m["shingle_n"]),
        int(m.get("pk_hex", TEXTINDEX_PK_HEX)),
    ).select(
        "band_pk",
        "band_idx",
        "band_key",
        F.col("doc_id").alias("new_id"),
        F.col("sig").alias("new_sig"),
    )
    keys = [r["band_pk"] for r in probe.select("band_pk").distinct().collect()]
    stored = read_index(spark, root, m).filter(F.col("band_pk").isin(keys))
    if broadcast_queries:
        probe = F.broadcast(probe)
    joined = stored.join(probe, ["band_pk", "band_idx", "band_key"])
    if not include_same_id:
        joined = joined.filter(F.col("doc_id") != F.col("new_id"))
    matches = F.size(
        F.filter(
            F.zip_with("sig", "new_sig", lambda a, b: a == b),
            lambda x: x,
        )
    ).cast("long")
    return (
        joined.select(
            F.col("new_id"),
            F.col("doc_id").alias("stored_id"),
            matches.alias("n_matching"),
        )
        .groupBy("new_id", "stored_id")
        .agg(F.max("n_matching").alias("n_matching"))
        .filter(F.col("n_matching") >= min_matches)
        .select(
            "new_id",
            "stored_id",
            "n_matching",
            F.expr(
                f"(2 * n_matching * 1000000 + {num_hashes})"
                f" div (2 * {num_hashes})"
            )
            .cast("long")
            .alias("est_jaccard_micro"),
        )
    )
