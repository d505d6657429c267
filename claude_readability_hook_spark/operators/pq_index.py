"""Product-quantized IVF index (FAISS IVF-PQ analog) — the next rung
on the repo's ANN compression ladder after IVF-Flat (float vectors)
and IVF-SQ8 (int8 + scale): each vector stores as m sub-space CODES
(one small int per sub-space, here m=8 codes for a 64-dim vector —
8 bytes/vector vs SQ8's 68 and Flat's 256), and queries score
candidates through lookup tables instead of arithmetic on
reconstructed vectors (the ADC trick that makes PQ fast in practice).

Layout and lifecycle are the ann_index machinery verbatim: rows
partition by the COARSE centroid_id (probes prune at the file index),
mutations commit immutable data dirs through the versioned-manifest
snapshot protocol, and the trained artifacts — coarse centroids plus
the m×k_pq×(dims/m) codebooks, a few KB — ride inside the manifest so
no torn publish exists.

Training (deterministic, RNG-free, oracle-twinned):
  - coarse quantizer: similarity.ivf_centroids (sampled Lloyd,
    means rounded to 6dp per iteration).
  - per-sub-space codebooks: the SAME sampled-Lloyd discipline on the
    sub-vector slices — init from vec_ids 0..k_pq-1, assignment by
    squared euclidean with ties to the lower id, empty clusters keep
    their previous centroid, means rounded to 6dp before re-entering
    the next argmin (the cross-engine float rule).

Scoring (asymmetric distance computation):
  for a query q, the driver precomputes two m×k_pq tables from the
  manifest payload — dot_part[j][c] = <q_j, codebook_j[c]> and
  norm_part[j][c] = |codebook_j[c]|², each rounded to 6dp (they
  re-enter comparisons) — and the candidate scan reduces to m array
  LOOKUPS per row: cos(q, x̂) = Σ_j dot_part[j][code_j] /
  (|q| · sqrt(Σ_j norm_part[j][code_j])). Pure codegen; the scan
  reads 8 bytes of payload per candidate. IEEE sqrt is exactly
  rounded, and both engines fold the j-sums in index order, so the
  DuckDB oracle reproduces the score bit-for-bit.

The standard PQ trade: ~32× smaller candidate I/O than Flat for an
approximate ranking whose fidelity is set by (m, k_pq); rerank the
PQ top-R against stored float vectors (the Flat index) when exact
order matters — the two indexes share coarse centroids, so the
rerank probe reads the same inverted lists.
"""

from __future__ import annotations

import math
import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ann_index import (
    _gc_previous_snapshots,
    _new_data_dir,
    _publish_manifest,
    current_manifest,
    ivf_probe_cids,
    read_index,
)
from .dedup import h32_expr
from .similarity import _argmin_centroid_expr, ivf_centroids

PQ_M = 8  # sub-spaces
PQ_K = 16  # codes per sub-space
PQ_ITERATIONS = 2


def _sub_slice(vec: F.Column, j: int, sd: int) -> F.Column:
    return F.slice(vec, j * sd + 1, sd)


def train_pq_codebooks(
    df: DataFrame,
    m: int = PQ_M,
    k_pq: int = PQ_K,
    iterations: int = PQ_ITERATIONS,
    dims: int = 64,
    vec_col: str = "embedding",
    sample_mod: int | None = None,
) -> list[list[list[float]]]:
    """codebooks[j][c] = the c-th centroid of sub-space j (list of
    dims/m floats, 6dp). One Lloyd loop per sub-space over the
    hash-sample; each iteration is one narrow job (assignment argmin
    in-row, k_pq-row mean shuffle) — training cost is sample-sized,
    never corpus-sized."""
    sd = dims // m
    train = df
    if sample_mod is not None:
        train = df.filter(
            (h32_expr(F.col("vec_id").cast("string")) % sample_mod) == 0
        )
    codebooks: list[list[list[float]]] = []
    init_rows = df.filter(F.col("vec_id") < k_pq).orderBy("vec_id").collect()
    for j in range(m):
        cents = [
            [float(v) for v in r[vec_col][j * sd : (j + 1) * sd]]
            for r in init_rows
        ]
        sub = train.select(_sub_slice(F.col(vec_col), j, sd).alias("sv"))
        for _ in range(iterations):
            assigned = sub.select(
                _argmin_centroid_expr(F.col("sv"), cents).alias("cid"),
                *[
                    F.element_at("sv", d + 1).cast("double").alias(f"d{d}")
                    for d in range(sd)
                ],
            )
            means = assigned.groupBy("cid").agg(
                *[F.avg(f"d{d}").alias(f"d{d}") for d in range(sd)]
            ).collect()
            new_cents = list(cents)
            for r in means:
                new_cents[r["cid"]] = [round(r[f"d{d}"], 6) for d in range(sd)]
            cents = new_cents
        codebooks.append(cents)
    return codebooks


def pq_codes_expr(
    vec: F.Column, codebooks: list[list[list[float]]]
) -> F.Column:
    """array<int> of m codes: per sub-space, the argmin codebook entry
    by squared euclidean (ties to the lower id) — m small literal
    argmins, all in-row."""
    m = len(codebooks)
    sd = len(codebooks[0][0])
    return F.array(
        *[
            _argmin_centroid_expr(_sub_slice(vec, j, sd), codebooks[j])
            for j in range(m)
        ]
    )


def build_ivf_pq_index(
    df: DataFrame,
    root: str,
    k: int = 8,
    iterations: int = 2,
    dims: int = 64,
    m: int = PQ_M,
    k_pq: int = PQ_K,
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
    sample_mod: int | None = None,
    retain_snapshots: int = 1,
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Train (coarse + PQ) and materialize: rows partitioned by the
    coarse centroid_id, payload = (vec_id, pq_codes). Both trained
    artifacts publish inside the manifest. Returns (centroids,
    codebooks)."""
    if centroids is None:
        centroids = ivf_centroids(df, k, iterations, dims, vec_col, sample_mod)
    if codebooks is None:
        codebooks = train_pq_codebooks(
            df, m, k_pq, PQ_ITERATIONS, dims, vec_col, sample_mod
        )
    ddir = _new_data_dir()
    (
        df.select(
            "vec_id",
            pq_codes_expr(F.col(vec_col), codebooks).alias("pq_codes"),
            _argmin_centroid_expr(F.col(vec_col), centroids).alias("centroid_id"),
        )
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(posixpath.join(root, ddir))
    )
    published = dict(
        kind="ivf_pq", dirs=[ddir], centroids=centroids, codebooks=codebooks
    )
    published["version"] = _publish_manifest(root, published)
    _gc_previous_snapshots(root, published, retain=retain_snapshots)
    return centroids, codebooks


def append_to_ivf_pq_index(
    df_new: DataFrame,
    root: str,
    vec_col: str = "embedding",
) -> None:
    """Incremental maintenance: encode NEW vectors with the EXISTING
    centroids + codebooks and merge-commit a fresh immutable data dir
    (the add()/retrain split; a lost publish race merges the winner's
    dirs via the callback body)."""
    mft = current_manifest(root)
    if mft is None:
        raise FileNotFoundError(f"no published index snapshot under {root}")
    centroids, codebooks = mft["centroids"], mft["codebooks"]
    ddir = _new_data_dir()
    (
        df_new.select(
            "vec_id",
            pq_codes_expr(F.col(vec_col), codebooks).alias("pq_codes"),
            _argmin_centroid_expr(F.col(vec_col), centroids).alias("centroid_id"),
        )
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(posixpath.join(root, ddir))
    )
    _publish_manifest(
        root,
        lambda cur: dict(
            kind="ivf_pq",
            dirs=(cur or mft)["dirs"] + [ddir],
            centroids=centroids,
            codebooks=codebooks,
        ),
    )


def _adc_tables(
    qvec: list[float], codebooks: list[list[list[float]]]
) -> tuple[list[list[float]], list[list[float]]]:
    """The driver-side ADC lookup tables (m×k_pq each, 6dp — they
    re-enter comparisons, so both engines must hold identical values):
    dot_part[j][c] = <q_j, cb_j[c]>, norm_part[j][c] = |cb_j[c]|²."""
    m = len(codebooks)
    sd = len(codebooks[0][0])
    dot_part = [
        [
            round(sum(qvec[j * sd + d] * cv[d] for d in range(sd)), 6)
            for cv in codebooks[j]
        ]
        for j in range(m)
    ]
    norm_part = [
        [round(sum(v * v for v in cv), 6) for cv in codebooks[j]]
        for j in range(m)
    ]
    return dot_part, norm_part


def ivf_pq_topk(
    spark: SparkSession,
    root: str,
    qvec: list[float],
    kk: int = 10,
    n_probe: int = 2,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """ANN top-k via ADC: partition-pruned probe scan (identical
    pruning to the float/q8 indexes), then per candidate just m table
    lookups + one sqrt — no per-dimension arithmetic touches the scan.
    Scores are the PQ-approximate cosine (reconstruction fidelity set
    by m, k_pq); ties break on vec_id."""
    mft = current_manifest(root)
    if mft is None:
        raise FileNotFoundError(f"no published index snapshot under {root}")
    centroids, codebooks = mft["centroids"], mft["codebooks"]
    m = len(codebooks)
    probes = ivf_probe_cids(qvec, centroids, n_probe)
    qnorm = math.sqrt(sum(v * v for v in qvec))
    dot_part, norm_part = _adc_tables(qvec, codebooks)
    dp_lit = F.array(*[F.array(*[F.lit(v) for v in row]) for row in dot_part])
    np_lit = F.array(*[F.array(*[F.lit(v) for v in row]) for row in norm_part])

    def lut_sum(lit3) -> F.Column:
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(m - 1)),
            F.lit(0.0),
            lambda acc, j: acc
            + F.element_at(
                F.element_at(lit3, j + 1),
                F.element_at("pq_codes", j + 1) + 1,
            ),
        )

    scan = read_index(spark, root, mft).filter(
        F.col("centroid_id").isin(probes)
    )
    if exclude_vec_id is not None:
        scan = scan.filter(F.col("vec_id") != exclude_vec_id)
    return (
        scan.select(
            "vec_id",
            F.round(
                lut_sum(dp_lit)
                / (F.lit(qnorm) * F.sqrt(lut_sum(np_lit))),
                6,
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(kk)
    )


def ivf_pq_topk_rerank(
    spark: SparkSession,
    root: str,
    source: DataFrame,
    qvec: list[float],
    kk: int = 10,
    n_probe: int = 2,
    rerank: int = 50,
    exclude_vec_id: int | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ preselect + exact rerank (the FAISS IVFPQ+refine pattern, and
    the right default when exact order matters): ADC ranks the probed
    lists reading 8 bytes/candidate, the top `rerank` ids — a
    documented tiny driver list, same contract as the probe unions —
    re-score by exact cosine against the float `source` table (an IN
    filter on vec_id pushes to that scan), and the exact top-k of the
    candidate set returns. Recall is set by (n_probe, rerank), cost by
    the PQ scan + `rerank` float-vector reads — on corpora where raw
    ADC ordering is weak (e.g. unstructured/random embeddings, the
    synthetic-corpus worst case), this recovers the exact ranking for
    a tiny constant overhead."""
    from .ann_index import _query_literal
    from .similarity import cosine_expr

    cand = [
        r["vec_id"]
        for r in ivf_pq_topk(
            spark, root, qvec, kk=rerank, n_probe=n_probe,
            exclude_vec_id=exclude_vec_id,
        ).collect()
    ]
    return (
        source.filter(F.col("vec_id").isin(cand))
        .select(
            "vec_id",
            F.round(
                cosine_expr(F.col(vec_col), _query_literal(qvec)), 6
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(kk)
    )


def ivf_pq_knn_join(
    spark: SparkSession,
    root: str,
    queries: DataFrame,
    kk: int = 10,
    n_probe: int = 2,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Batch k-NN retrieval against the PQ index — the PQ member of
    the knn-join family (flat / q8 / lsh): in-row probe selection on
    the coarse centroids, probe-union STATIC partition filter, query
    join on the centroid_id partition column (broadcast by default,
    `broadcast_queries=False` for batches too big to broadcast —
    shuffle-hash via AQE, same knob as ivf_knn_join), then per
    (query, candidate) the ADC score computed IN-ROW against the
    literal codebooks: per-query lookup tables don't exist in batch
    mode, so the dot folds j-then-d over the codebook literals
    (~m·(dims/m) = dims multiplies per candidate — still reading only
    8 bytes of payload); the query-independent norm table stays a
    rounded 6dp literal, shared with the single-query path. One
    narrow top-k window closes the plan."""
    from pyspark.sql import Window

    from .similarity import probe_cids_expr

    mft = current_manifest(root)
    if mft is None:
        raise FileNotFoundError(f"no published index snapshot under {root}")
    centroids, codebooks = mft["centroids"], mft["codebooks"]
    m = len(codebooks)
    sd = len(codebooks[0][0])
    cb_lit = F.array(
        *[
            F.array(*[F.array(*[F.lit(v) for v in cv]) for cv in codebooks[j]])
            for j in range(m)
        ]
    )
    np_lit = F.array(
        *[
            F.array(
                *[
                    F.lit(round(sum(v * v for v in cv), 6))
                    for cv in codebooks[j]
                ]
            )
            for j in range(m)
        ]
    )

    exploded = queries.select(
        F.col(query_id_col).alias("_qid"),
        F.col(vec_col).alias("_qvec"),
        F.explode(
            probe_cids_expr(F.col(vec_col), centroids, n_probe)
        ).alias("_probe_cid"),
    )
    # documented tiny driver agg: ≤ len(centroids) distinct probe keys
    probe_union = sorted(
        r["_probe_cid"] for r in exploded.select("_probe_cid").distinct().collect()
    )
    index = read_index(spark, root, mft).filter(
        F.col("centroid_id").isin(probe_union)
    )
    qside = F.broadcast(exploded) if broadcast_queries else exploded
    cand = index.join(
        qside, index["centroid_id"] == qside["_probe_cid"]
    ).filter(F.col("vec_id") != F.col("_qid"))

    qv = F.col("_qvec")
    code_at = lambda j: F.element_at("pq_codes", j + 1) + 1
    dot = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.aggregate(
            F.sequence(F.lit(1), F.lit(sd)),
            F.lit(0.0),
            lambda a2, d: a2
            + F.element_at(qv, j * sd + d).cast("double")
            * F.element_at(
                F.element_at(F.element_at(cb_lit, j + 1), code_at(j)), d
            ),
        ),
    )
    nsum = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc + F.element_at(F.element_at(np_lit, j + 1), code_at(j)),
    )
    qnorm = F.sqrt(
        F.aggregate(
            F.transform(qv, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda a, v: a + v,
        )
    )
    scored = cand.select(
        F.col("_qid").alias(query_id_col),
        "vec_id",
        F.round(dot / (qnorm * F.sqrt(nsum)), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= kk)
        .select(
            query_id_col, "vec_id", "cosine",
            F.col("rank").cast("long").alias("rank"),
        )
    )
