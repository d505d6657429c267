"""Deduplication operators for training-data pipelines.

Four tiers, each with a different cost/recall point at 100 TB:

  exact_duplicates      one shuffle on a 16-byte hash — always run first
  minhash_lsh           shingle → minhash signature → banded bucket join;
                        candidate pairs without the n² cross-join
  simhash               per-doc 16-bit signature; near-dups share values
                        (or differ by 1-2 bits); one narrow shuffle
  ngram_jaccard_pairs   exact Jaccard on shingle sets via shingle-key
                        self-join — the verifier for LSH candidates

Scale notes (the design point is 10^12 docs):
  - every operator keys its shuffle on a short hash/shingle, never on
    raw text; signatures are computed where the text is read — as of
    r9 via mapInArrow batch loops (hashlib md5 == Spark md5, exact
    int64 arithmetic), which replaced the interpreted higher-order
    Column forms (CodegenFallback) at identical results
  - minhash banding keeps the self-join key space sparse: expected
    bucket size is O(1) for non-duplicates, so the join output is
    ~linear in the number of true near-dup pairs
  - the jaccard verifier joins on exploded shingles and would blow up
    on boilerplate shingles; the hot-shingle cap (drop shingles shared
    by > max_shingle_df docs) bounds worst-case fanout — the same
    trick as salting a skewed join key
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textcommon import norm_text_expr


def exact_duplicates(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup on normalized text. Returns one row per duplicate
    GROUP: (dup_hash, n_docs, keeper_doc_id) with n_docs >= 2.

    DuckDB oracle: md5 over the same normalization, HAVING count(*)>1.
    """
    return (
        df.select(
            F.col("doc_id"), F.md5(norm_text_expr(F.col(text_col))).alias("dup_hash")
        )
        .groupBy("dup_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def exact_dup_losers(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id) of every exact-duplicate NON-keeper (keeper = min doc_id
    per group). The projection is narrow — doc_id + a 16-byte hash — so
    the window shuffle never moves text; downstream operators drop the
    losers with an anti-join against their own (already narrow)
    intermediate instead of re-shuffling the corpus."""
    w = Window.partitionBy("dup_hash").orderBy("doc_id")
    return (
        df.select("doc_id", F.md5(norm_text_expr(F.col(text_col))).alias("dup_hash"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") >= 2)
        .select("doc_id")
    )


def exact_dedup_keepers(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep one representative (min doc_id) per exact-duplicate group.

    NOTE the shuffle shape: this anti-join moves the full rows (text
    included) by doc_id — fine when the result feeds an operator that
    must see the text anyway, wasteful as a pre-pass for operators
    whose own intermediates are narrow (minhash anti-joins its
    signature table against exact_dup_losers instead)."""
    return df.join(exact_dup_losers(df, text_col), "doc_id", "left_anti")


def doc_shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, shingles array<string>) — shared by the near-dup
    family. Distinct n-grams in first-appearance order (array_distinct
    semantics), built in ONE mapInArrow stage instead of the
    interpreted shingles_expr lambda chain (CodegenFallback); the
    tokenizer is the exact Java-\\s clone, so arrays are identical."""
    base = df.select("doc_id", F.col(text_col).alias("t"))
    id_type = base.schema["doc_id"].dataType.simpleString()

    def sh_batches(batches):
        import re

        import pyarrow as pa

        ws = re.compile(r"[ \t\n\x0b\f\r]+")
        for batch in batches:
            texts = batch.column("t").to_pylist()
            out: list[list[str]] = []
            for txt in texts:
                toks = [t for t in ws.split(txt) if t]
                if len(toks) < n:
                    out.append([])
                    continue
                out.append(
                    list(
                        dict.fromkeys(
                            " ".join(toks[i : i + n])
                            for i in range(len(toks) - n + 1)
                        )
                    )
                )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),  # caller's id type, verbatim
                    pa.array(out, pa.list_(pa.string())),
                ],
                names=["doc_id", "shingles"],
            )

    return base.mapInArrow(
        sh_batches, schema=f"doc_id {id_type}, shingles array<string>"
    )


# Universal-hash family over the 32-bit prefix of md5: hash_i(s) =
# (A[i]·h32(s) + B[i]) mod P. P is the first prime > 2^32; A[i] < 2^30
# keeps A·h32 + B < 2^63 so the arithmetic is exact int64 in ANY engine
# (DuckDB errors on overflow; Spark would wrap silently).
MINHASH_PRIME = 4_294_967_311


def minhash_params(num_hashes: int) -> tuple[list[int], list[int]]:
    a = [(((i + 1) * 2_654_435_761 + 1_013_904_223) % ((1 << 30) - 1)) | 1 for i in range(num_hashes)]
    b = [((i + 1) * 1_013_904_223 + 12_345) % MINHASH_PRIME for i in range(num_hashes)]
    return a, b


def h32_expr(s):
    """First 8 hex chars of md5 as int64 — engine-portable.
    DuckDB twin: list_sum(list_transform(range(1,9), j ->
      (strpos('0123456789abcdef', substr(md5(s), j, 1)) - 1)
      * CAST(16**(8-j) AS BIGINT)))"""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def _expand_pairs(grouped: DataFrame, ids_col: str = "ids") -> DataFrame:
    """Bucket rows (… , ids: sorted array) → distinct (doc_a, doc_b)
    pairs, expanded where the bucket row lives (no self-join, so the
    bucket pipeline is computed exactly once). The m² expansion runs
    as a mapInArrow batch loop — the nested sequence/transform/struct
    Column form it replaces is interpreted per element
    (CodegenFallback); the distinct stays a JVM hash agg."""
    buckets = grouped.select(F.col(ids_col).alias("ids"))
    elem_type = buckets.schema["ids"].dataType.elementType.simpleString()

    def expand(batches):
        import pyarrow as pa

        for batch in batches:
            col = batch.column("ids")
            et = col.type.value_type
            a: list = []
            b: list = []
            for ids in col.to_pylist():
                m = len(ids)
                for i in range(m - 1):
                    x = ids[i]
                    for j in range(i + 1, m):
                        a.append(x)
                        b.append(ids[j])
            yield pa.RecordBatch.from_arrays(
                [pa.array(a, et), pa.array(b, et)],
                names=["doc_a", "doc_b"],
            )

    return buckets.mapInArrow(
        expand, schema=f"doc_a {elem_type}, doc_b {elem_type}"
    ).distinct()


def minhash_signature(
    df: DataFrame, num_hashes: int = 12, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Minhash signature as num_hashes columns s0..s{k-1}; docs with
    no shingle (< n tokens) are absent, matching the shingle-set
    semantics.

    ONE mapInArrow stage: tokenize, shingle, md5-prefix hash and the
    k affine minima all happen where the text is read — hashlib md5
    matches Spark md5() byte-for-byte and the affine arithmetic is
    exact int64 (A < 2^30 keeps A·h32+B < 2^62), so signatures are
    bit-identical to the former explode → groupBy(doc_id) min-agg
    plan while skipping its interpreted shingle lambdas AND its
    per-shingle shuffle rows entirely — at 10^12 docs NOTHING
    shuffles here; signatures emerge in the scan stage."""
    A, B = minhash_params(num_hashes)
    prime = MINHASH_PRIME
    base = df.select("doc_id", F.col(text_col).alias("t"))
    id_type = base.schema["doc_id"].dataType.simpleString()

    def sig_batches(batches):
        import re
        from hashlib import md5

        import numpy as np
        import pyarrow as pa

        # Java regex \s == [ \t\n\x0b\f\r] (ASCII-only) — match
        # tokens_expr exactly
        ws = re.compile(r"[ \t\n\x0b\f\r]+")
        Aa = np.array(A, dtype=np.int64)[:, None]
        Bb = np.array(B, dtype=np.int64)[:, None]
        for batch in batches:
            texts = batch.column("t").to_pylist()
            keep: list[int] = []
            sigs: list[np.ndarray] = []
            for row, txt in enumerate(texts):
                toks = [t for t in ws.split(txt) if t]
                if len(toks) < n:
                    continue
                sh = {
                    " ".join(toks[i : i + n])
                    for i in range(len(toks) - n + 1)
                }
                hs = np.array(
                    [int(md5(s.encode()).hexdigest()[:8], 16) for s in sh],
                    dtype=np.int64,
                )
                keep.append(row)
                sigs.append(((Aa * hs + Bb) % prime).min(axis=1))
            mat = (
                np.stack(sigs)
                if sigs
                else np.empty((0, num_hashes), dtype=np.int64)
            )
            # take() preserves the caller's doc_id type exactly —
            # streaming/index callers use string ids, the corpus long
            ids = batch.column("doc_id").take(pa.array(keep, pa.int32()))
            yield pa.RecordBatch.from_arrays(
                [ids] + [pa.array(mat[:, i]) for i in range(num_hashes)],
                names=["doc_id"] + [f"s{i}" for i in range(num_hashes)],
            )

    schema = ", ".join(
        [f"doc_id {id_type}"] + [f"s{i} long" for i in range(num_hashes)]
    )
    return base.mapInArrow(sig_batches, schema=schema)


def minhash_band_buckets(
    df: DataFrame,
    num_hashes: int = 12,
    band_size: int = 3,
    text_col: str = "text",
    n: int = 3,
    exact_dedup_first: bool = True,
) -> DataFrame:
    """(band_idx, band_key, ids) LSH buckets with ≥ 2 members.

    signature agg → band keys (md5 of '|'-joined band values) → stack to
    (band_idx, band_key) rows → groupBy bucket, collect sorted doc ids.
    Two small shuffles; expected bucket size is O(1) for non-duplicates.

    exact_dedup_first drops verbatim clones BEFORE banding — but on the
    narrow side: signatures are computed for all docs (text stays in
    the scan; the signature agg's map-side partial min ships only tiny
    partials), then the 13-column signature table anti-joins
    exact_dup_losers. Re-keying the corpus itself by content hash would
    shuffle every text byte at 10^12 docs — this path never does."""
    nbands = num_hashes // band_size
    sig = minhash_signature(df, num_hashes, text_col, n)
    if exact_dedup_first:
        sig = sig.join(exact_dup_losers(df, text_col), "doc_id", "left_anti")
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
    with_bands = sig.select("doc_id", *band_cols)
    stack_args = ", ".join(f"{b}, b{b}" for b in range(nbands))
    bands = with_bands.selectExpr(
        "doc_id", f"stack({nbands}, {stack_args}) AS (band_idx, band_key)"
    )
    return (
        bands.groupBy("band_idx", "band_key")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )


def minhash_lsh_candidates(
    df: DataFrame,
    num_hashes: int = 12,
    band_size: int = 3,
    text_col: str = "text",
    n: int = 3,
    max_bucket_size: int | None = 50,
    exact_dedup_first: bool = True,
) -> DataFrame:
    """Candidate near-dup pairs (doc_a < doc_b) sharing ≥ 1 LSH band.

    Bucket → in-row pair expansion → distinct; the expansion output is
    ~linear in true near-dup pairs. Two guards bound the worst case
    (the same fanout control as the jaccard operator's max_shingle_df):

      exact_dedup_first  verbatim clones are collapsed to one
                         representative BEFORE banding (they share
                         every band — a popular boilerplate page would
                         otherwise put its whole clone set in one
                         bucket); the anti-join runs on the NARROW
                         signature table so text never shuffles; the
                         clones themselves are exact_duplicates' job
      max_bucket_size    buckets larger than this are dropped instead
                         of expanded to O(m²) pairs / OOM'ing the
                         collect — count them via
                         minhash_oversize_buckets for quarantine"""
    grouped = minhash_band_buckets(
        df, num_hashes, band_size, text_col, n, exact_dedup_first
    )
    if max_bucket_size is not None:
        grouped = grouped.filter(F.size("ids") <= max_bucket_size)
    return _expand_pairs(grouped)


def minhash_oversize_buckets(
    df: DataFrame,
    num_hashes: int = 12,
    band_size: int = 3,
    text_col: str = "text",
    n: int = 3,
    max_bucket_size: int = 50,
    exact_dedup_first: bool = True,
) -> DataFrame:
    """The buckets minhash_lsh_candidates dropped: (band_idx, band_key,
    n_docs) for the quarantine/lineage sink — metadata only, never the
    member list itself."""
    return (
        minhash_band_buckets(df, num_hashes, band_size, text_col, n, exact_dedup_first)
        .filter(F.size("ids") > max_bucket_size)
        .select("band_idx", "band_key", F.size("ids").cast("long").alias("n_docs"))
    )


def dedup_clusters(pairs: DataFrame, max_iterations: int = 20) -> DataFrame:
    """Connected components over near-dup pairs → (doc_id, cluster_id)
    with cluster_id = min doc_id of the component (the canonical
    keeper). Docs appearing in no pair are absent (singletons keep
    themselves by definition).

    Algorithm: iterative min-label propagation (the standard
    Pregel-style CC; public algorithm) with ADAPTIVE POINTER JUMPING:
    each round every node adopts the minimum label among itself and
    its neighbors; from round 3 onward — i.e. only if the graph has
    NOT converged after two plain rounds — the round also compresses
    one pointer hop (label ← label-of-label), which doubles the
    propagation distance per round, so a pathological chain still
    converges in O(log diameter) (a 50-link chain closes in ≤ 8
    rounds). Near-dup components are usually star/clique-shaped
    (diameter ≤ ~3) and converge inside the two plain rounds, so the
    common case never pays the jump's extra self-join — the r3 verdict
    measured the unconditional jump at ~+26% on typical graphs, pure
    insurance cost. Per round: one groupBy(node) min-agg over the edge
    list joined with current labels, plus (jump rounds only) one
    self-join of the narrow (node, label) table — shuffles carry longs
    only. The driver-side convergence check is one count per round on
    a changed-labels filter over the freshly checkpointed labels
    (documented small agg — the checkpoint already ran the job, the
    count is a local scan of it). If the round cap is hit before
    convergence, a warning is raised rather than silently returning
    fragmented clusters.

    DuckDB twin: recursive-CTE transitive closure with min-label
    aggregation (exact for the test scales; the iterative form is the
    one that runs at 10^12 edges)."""
    import warnings

    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .distinct()
    )
    edges = edges.localCheckpoint(eager=True)  # reused every round
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    converged = False
    stale: list[DataFrame] = []
    for round_idx in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        hop = labels.join(neighbor_min, labels["node"] == neighbor_min["src"], "left").select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("hop_label"),
            "label",
        )
        if round_idx < 2:
            # plain propagation: typical (star/clique) graphs converge
            # here without ever paying the jump self-join
            updated = hop.select(
                "node", F.col("hop_label").alias("new_label"), "label"
            )
        else:
            # pointer jump: follow the adopted label one more step. A
            # label is always the id of a node in the table (min over
            # member ids), so the self-join resolves; least() keeps
            # monotonicity.
            jump_src = hop.select(
                F.col("node").alias("jnode"), F.col("hop_label").alias("jlabel")
            )
            updated = (
                hop.join(jump_src, hop["hop_label"] == jump_src["jnode"], "left")
                .select(
                    "node",
                    F.least(
                        F.col("hop_label"),
                        F.coalesce(F.col("jlabel"), F.col("hop_label")),
                    ).alias("new_label"),
                    "label",
                )
            )
        # ONE driver barrier per round: the convergence count's job
        # doubles as the cache materialization (the former eager
        # checkpoint + count paid two). Lineage still truncates every
        # few rounds so the iterative plan stays bounded; superseded
        # caches release once the new generation is materialized.
        if (round_idx + 1) % 2 == 0:
            updated = updated.localCheckpoint(eager=True)
        else:
            updated = updated.persist()
        changed = updated.filter(F.col("new_label") < F.col("label")).count()
        for s in stale:
            s.unpersist()
        stale = [updated]
        labels = updated.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            converged = True
            break
    if not converged:
        warnings.warn(
            f"dedup_clusters: label propagation did not converge within "
            f"{max_iterations} rounds — cluster_ids may be fragmented; "
            f"raise max_iterations",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def simhash(df: DataFrame, bits: int = 16, text_col: str = "text") -> DataFrame:
    """Per-doc simhash over whitespace tokens.

    Token bit b is bit (3 − b%4) of hex char b//4 of md5(token) —
    arithmetic only, so the identical formula runs in DuckDB.
    Signature bit b is the sign of the ±1 vote sum (every OCCURRENCE
    votes); tokenless docs carry simhash 0.

    ONE mapInArrow stage, no shuffle at all: per batch, token counts
    fold into the vote sums with one md5 per DISTINCT token per doc
    (a repeated token multiplies its vote instead of re-hashing — the
    former explode plan hashed every occurrence), and every doc row
    is emitted directly so the tokenless-restore join disappears.
    Exact integer votes, hashlib md5 == Spark md5 — signatures are
    bit-identical."""
    base = df.select("doc_id", F.col(text_col).alias("t"))
    id_type = base.schema["doc_id"].dataType.simpleString()
    nhex = (bits + 3) // 4

    def sim_batches(batches):
        import re
        from collections import Counter
        from hashlib import md5

        import pyarrow as pa

        ws = re.compile(r"[ \t\n\x0b\f\r]+")
        for batch in batches:
            texts = batch.column("t").to_pylist()
            out: list[int] = []
            for txt in texts:
                votes = [0] * bits
                for tok, c in Counter(
                    t for t in ws.split(txt) if t
                ).items():
                    hv = int(md5(tok.encode()).hexdigest()[:nhex], 16)
                    top = nhex * 4 - 1
                    for b in range(bits):
                        if (hv >> (top - b)) & 1:
                            votes[b] += c
                        else:
                            votes[b] -= c
                sig = 0
                for b in range(bits):
                    if votes[b] > 0:
                        sig |= 1 << b
                out.append(sig)
            yield pa.RecordBatch.from_arrays(
                [batch.column("doc_id"), pa.array(out, pa.int64())],
                names=["doc_id", "simhash"],
            )

    return base.mapInArrow(
        sim_batches, schema=f"doc_id {id_type}, simhash long"
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
    max_shingle_df: int = 100,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing ≥1 shingle.

    (doc_a, doc_b, jaccard) with jaccard rounded to 6dp and ≥ threshold.
    The max_shingle_df cap drops boilerplate shingles before the
    self-join — fanout control, same role as skew-salting."""
    shingled = doc_shingles(df, text_col, n).filter(F.size("shingles") > 0)

    # Carry each doc's shingle-set size THROUGH the bucket expansion so
    # no per-doc size join (which would re-derive the whole shingle
    # pipeline per join side) is needed afterwards. The (doc_id, size)
    # pair is packed into one bigint — struct collect/sort/compare is
    # interpreted per element and measured 8× slower than bigint ops.
    # Capacity: doc_id < 2^41 (2·10^12, the design point) and
    # shingle count < 2^22 (a 10 MB doc caps out around 2M tokens).
    #
    # groupBy + in-row pair expansion instead of a self-join: the
    # shingle pipeline is computed once, and the hot-shingle cap is a
    # plain size filter on the collected bucket (df > max ⇒ dropped).
    shift = 1 << 22
    exploded = shingled.select(
        (F.col("doc_id") * shift + F.size("shingles")).alias("dk"),
        F.explode("shingles").alias("shingle"),
    )
    grouped = (
        exploded.groupBy("shingle")
        .agg(F.sort_array(F.collect_list("dk")).alias("ks"))
        .filter((F.size("ks") >= 2) & (F.size("ks") <= max_shingle_df))
    )
    # m² bucket expansion as a mapInArrow batch loop (the nested
    # sequence/transform/struct Column form is interpreted per
    # element — CodegenFallback); the shared-count hash agg stays JVM
    def expand(batches):
        import pyarrow as pa

        for batch in batches:
            a: list[int] = []
            b: list[int] = []
            for ks in batch.column("ks").to_pylist():
                m = len(ks)
                for i in range(m - 1):
                    x = ks[i]
                    for j in range(i + 1, m):
                        a.append(x)
                        b.append(ks[j])
            yield pa.RecordBatch.from_arrays(
                [pa.array(a, pa.int64()), pa.array(b, pa.int64())],
                names=["ka", "kb"],
            )

    shared = (
        grouped.select("ks")
        .mapInArrow(expand, schema="ka long, kb long")
        .groupBy("ka", "kb")
        .agg(F.count("*").alias("shared"))
    )
    return shared.select(
        F.floor(F.col("ka") / shift).cast("long").alias("doc_a"),
        F.floor(F.col("kb") / shift).cast("long").alias("doc_b"),
        F.round(
            F.col("shared")
            / ((F.col("ka") % shift) + (F.col("kb") % shift) - F.col("shared")),
            6,
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)
