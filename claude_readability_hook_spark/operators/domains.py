"""Domain-level curation signals: per-registrable-domain aggregates
(doc counts, subdomain diversity, exact-dup rate, quality-keep rate,
PII density, bigram-LM surprise) joined back to documents as curation
features, plus a threshold/blocklist gate — the crawl-governance
operator every production pipeline runs (CCNet buckets by domain;
RefinedWeb and Gopher both publish domain-level block/allow rules).

Scale shape: the signal table is ONE hash aggregation per component
over the corpus scan, grouped by registrable domain — output
cardinality is the domain count (millions at 100 TB, not billions),
so the gate join back to documents is a classic small-side join. The
gate auto-broadcasts below a row bound and falls back to a shuffle
join above it (the canonicalize_media_refs auto-regime discipline —
never an unguarded driver-side default).

Registrable-domain extraction uses an embedded multi-part-suffix set
(the high-traffic public-suffix entries) rather than the full PSL:
deterministic, pure Column expr, and the DuckDB oracle replays the
identical case analysis. Swapping in a full PSL broadcast table is a
data change, not a code change.

All rates are exact INTEGER micro-units (the r5 rounding lesson:
`div` on both engines, no float before the end); the LM surprise mean
aggregates per-bigram integer micro terms per domain, so the domain
mean never averages pre-rounded doubles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .lmfilter import (
    LM_SAMPLE_MOD,
    _lower_tokens,
    _pairs_expr,
    train_bigram_lm,
)
from .pii import EMAIL_RE, EMAIL_TOKEN, IPV4_RE, IP_TOKEN, PHONE_RE
from .textstats import quality_keep_expr

# High-traffic multi-part public suffixes (static subset of the PSL —
# see module docstring). Sorted tuple so the generated expression and
# the oracle enumerate identically.
MULTIPART_SUFFIXES: tuple[str, ...] = (
    "ac.jp",
    "ac.uk",
    "blogspot.com",
    "co.in",
    "co.jp",
    "co.kr",
    "co.nz",
    "co.uk",
    "com.au",
    "com.br",
    "com.cn",
    "com.mx",
    "github.io",
    "gov.uk",
    "ne.jp",
    "net.au",
    "or.jp",
    "org.uk",
)

_IP_RE = r"^\d{1,3}(\.\d{1,3}){3}$"


def registrable_domain_expr(host: Column) -> Column:
    """host -> registrable domain (eTLD+1): lowercase; IP literals and
    one/two-label hosts pass through; otherwise the last two labels,
    or the last three when the last two form a multi-part suffix."""
    h = F.lower(host)
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    last3 = F.array_join(F.slice(labels, -3, 3), ".")
    multipart = F.array(*[F.lit(s) for s in MULTIPART_SUFFIXES])
    return (
        F.when(h.rlike(_IP_RE) | (n <= 2), h)
        .when(F.array_contains(multipart, last2), last3)
        .otherwise(last2)
    )


def _pii_hits_expr(text: Column) -> Column:
    """Total PII hits with the redact-order discipline (pii.py: email
    -> IPv4 -> phone, each counting on the previous stage's output)."""
    after_email = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    after_ip = F.regexp_replace(after_email, IPV4_RE, IP_TOKEN)
    return (
        F.regexp_count(text, F.lit(EMAIL_RE))
        + F.regexp_count(after_email, F.lit(IPV4_RE))
        + F.regexp_count(after_ip, F.lit(PHONE_RE))
    ).cast("long")


def _rate_micro(num: Column, den: Column) -> Column:
    """Half-up integer micro-rate: (num/den)*1e6 via the div identity
    both engines integer-divide identically (non-negative inputs)."""
    return F.expr(f"(2 * ({num}) * 1000000 + ({den})) div (2 * ({den}))").cast(
        "long"
    )


def domain_signals(
    docs: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    lm: tuple[DataFrame, DataFrame, DataFrame] | None = None,
    sample_mod: int | None = LM_SAMPLE_MOD,
    exact_distinct: bool = True,
) -> DataFrame:
    """One row per registrable domain:

      (domain, n_docs, n_hosts, n_exact_dup, dup_micro,
       n_quality_keep, quality_micro, pii_hits, pii_per_mchar,
       n_bigrams, lm_micro)

    n_exact_dup = docs beyond the first per distinct md5(text) within
    the domain; dup_micro/quality_micro are half-up micro-rates of
    n_docs; pii_per_mchar = PII hits per million characters; lm_micro
    = the half-up micro mean of per-BIGRAM add-one surprise terms
    across all the domain's bigrams (not a mean of per-doc means —
    one groupBy, and short docs contribute exactly their bigrams).

    exact_distinct=False swaps the two exact count-distincts for
    approx_count_distinct — the 100 TB knob (exact multi-distinct
    plans via expand cost ~2 extra scan passes); the oracle pins the
    exact path. Pass a pre-trained `lm` to amortize training; when
    this function trains its own it releases the cache before
    returning (release_lm)."""
    text = F.col(text_col)
    d = docs.select(
        registrable_domain_expr(F.col(host_col)).alias("domain"),
        F.col(host_col).alias("h"),
        F.md5(text).alias("text_md5"),
        quality_keep_expr(text).cast("long").alias("qk"),
        _pii_hits_expr(text).alias("pii"),
        F.length(text).cast("long").alias("nc"),
    )
    cd = (F.countDistinct if exact_distinct else F.approx_count_distinct)
    base = d.groupBy("domain").agg(
        F.count("*").cast("long").alias("n_docs"),
        cd("h").cast("long").alias("n_hosts"),
        cd("text_md5").cast("long").alias("n_distinct_text"),
        F.sum("qk").cast("long").alias("n_quality_keep"),
        F.sum("pii").cast("long").alias("pii_hits"),
        F.sum("nc").cast("long").alias("n_chars"),
    )

    # when we own the LM, train WITHOUT persist (the r6 ADVICE
    # ownership rule — callers passing `lm` own their own release),
    # but materialize the vocab-bounded bigram table once: the
    # broadcast-auto count below is an extra reference, and without
    # a checkpoint it would replay the whole sample scan + pair agg
    # that derives bg (and ctx would replay it a third time)
    if lm is not None:
        bg, ctx, vocab = lm
    else:
        bg, _ctx, vocab = train_bigram_lm(
            docs, sample_mod, text_col, persist=False
        )
        bg = bg.localCheckpoint(eager=True)
        ctx = bg.groupBy("w1").agg(F.sum("c12").alias("c1"))
    pairs = docs.select(
        registrable_domain_expr(F.col(host_col)).alias("domain"),
        F.explode(_pairs_expr(_lower_tokens(text_col))).alias("p"),
    ).select("domain", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    from .lmfilter import _lm_broadcast_auto

    if _lm_broadcast_auto(bg, None):
        bg, ctx, vocab = F.broadcast(bg), F.broadcast(ctx), F.broadcast(vocab)
    terms = (
        pairs.join(bg, ["w1", "w2"], "left")
        .join(ctx, ["w1"], "left")
        .crossJoin(vocab)
        .select(
            "domain",
            F.expr(
                "(2 * (coalesce(c1, 0) + v) * 1000000"
                " + (coalesce(c12, 0) + 1))"
                " div (2 * (coalesce(c12, 0) + 1))"
            ).alias("term_micro"),
        )
    )
    lm_agg = terms.groupBy("domain").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.expr(
            "(2 * sum(term_micro) + count(*)) div (2 * count(*))"
        )
        .cast("long")
        .alias("lm_micro"),
    )

    out = (
        base.join(lm_agg, "domain", "left")
        .select(
            "domain",
            "n_docs",
            "n_hosts",
            (F.col("n_docs") - F.col("n_distinct_text"))
            .cast("long")
            .alias("n_exact_dup"),
            _rate_micro("n_docs - n_distinct_text", "n_docs").alias(
                "dup_micro"
            ),
            "n_quality_keep",
            _rate_micro("n_quality_keep", "n_docs").alias("quality_micro"),
            "pii_hits",
            _rate_micro("pii_hits", "greatest(n_chars, 1)").alias(
                "pii_per_mchar"
            ),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("lm_micro", F.lit(0)).cast("long").alias("lm_micro"),
        )
    )
    return out


GATE_BLOCKLISTED = "blocklisted"
GATE_TOO_FEW_DOCS = "too_few_docs"
GATE_DUP_HEAVY = "dup_heavy"
GATE_LOW_QUALITY = "low_quality"
GATE_PII_DENSE = "pii_dense"
GATE_OK = "ok"


def domain_gate(
    docs: DataFrame,
    signals: DataFrame | None = None,
    host_col: str = "host",
    text_col: str = "text",
    min_docs: int = 1,
    max_dup_micro: int = 500_000,
    min_quality_micro: int = 250_000,
    max_pii_per_mchar: int = 2_000,
    blocklist: tuple[str, ...] = (),
    broadcast_signals: bool | None = None,
    broadcast_signals_max: int = 5_000_000,
) -> DataFrame:
    """docs + (domain, domain_keep, gate_reason): the per-domain
    governance gate. gate_reason is the FIRST failing rule in fixed
    precedence blocklist > min_docs > dup > quality > pii, 'ok' when
    the domain passes. The signal table joins back on domain:
    broadcast below broadcast_signals_max rows (counted — the
    auto-regime discipline), shuffle join above; booleans override."""
    if signals is None:
        signals = domain_signals(docs, host_col, text_col)
    block = F.array(*[F.lit(b) for b in blocklist]) if blocklist else None
    reason = (
        F.when(
            F.array_contains(block, F.col("domain"))
            if block is not None
            else F.lit(False),
            GATE_BLOCKLISTED,
        )
        .when(F.col("n_docs") < min_docs, GATE_TOO_FEW_DOCS)
        .when(F.col("n_dup_micro_") > max_dup_micro, GATE_DUP_HEAVY)
        .when(F.col("n_quality_micro_") < min_quality_micro, GATE_LOW_QUALITY)
        .when(F.col("n_pii_mchar_") > max_pii_per_mchar, GATE_PII_DENSE)
        .otherwise(GATE_OK)
    )
    verdicts = signals.select(
        "domain",
        F.col("n_docs"),
        F.col("dup_micro").alias("n_dup_micro_"),
        F.col("quality_micro").alias("n_quality_micro_"),
        F.col("pii_per_mchar").alias("n_pii_mchar_"),
    ).select(
        "domain",
        reason.alias("gate_reason"),
    ).select(
        "domain", "gate_reason", (F.col("gate_reason") == GATE_OK).alias(
            "domain_keep"
        )
    )
    if broadcast_signals is None:
        broadcast_signals = verdicts.count() <= broadcast_signals_max
    if broadcast_signals:
        verdicts = F.broadcast(verdicts)
    tagged = docs.withColumn(
        "domain", registrable_domain_expr(F.col(host_col))
    )
    return tagged.join(verdicts, "domain", "left").select(
        *docs.columns,
        "domain",
        F.coalesce("domain_keep", F.lit(False)).alias("domain_keep"),
        F.coalesce("gate_reason", F.lit(GATE_TOO_FEW_DOCS)).alias(
            "gate_reason"
        ),
    )
