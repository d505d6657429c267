"""Text analysis for training-data curation: token counts, quality
scoring, language ID, fingerprinting.

All pure Column expressions (whole-stage codegen; zero Python) with
exact DuckDB twins — these run in the same scan as extraction output
filtering, so at 100 TB they are free riders on a pass the pipeline
already makes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textcommon import norm_text_expr, tokens_expr

# Tiny per-language stopword sets for the n-gram/stopword heuristic.
# Deliberately small and frozen: the oracle SQL embeds the same lists.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "que", "pour", "dans"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "que", "por", "para"),
}


def token_count_expr(text: Column) -> Column:
    return F.size(tokens_expr(text))


def corpus_report(df: DataFrame, short_tokens: int = 20, text_col: str = "text") -> DataFrame:
    """ONE-pass corpus health report — the first query run on a fresh
    crawl dump: doc/source counts, byte/token volumes, length
    distribution (mean/median/max), short-doc rate. A single global
    aggregation: every metric reduces in the same partial-agg pass, so
    the whole report costs one scan + one 1-row shuffle at any corpus
    size (the point — NOT one job per metric). DuckDB twin uses
    quantile_cont for the median (same interpolated definition as
    Spark's percentile)."""
    n_tokens = token_count_expr(F.col(text_col))
    return df.select(
        "doc_id", "source", F.length(text_col).alias("n_chars"), n_tokens.alias("nt")
    ).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum("nt").cast("long").alias("total_tokens"),
        # mean from the EXACT integer sum (no float accumulation order)
        F.round(F.sum("nt").cast("double") / F.count("*"), 6).alias("mean_tokens"),
        F.round(F.expr("percentile(nt, 0.5)"), 6).alias("median_tokens"),
        F.max("nt").cast("long").alias("max_tokens"),
        F.sum(F.when(F.col("nt") < short_tokens, 1).otherwise(0))
        .cast("long")
        .alias("n_short"),
    )


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_chars_actual, mean_token_len)."""
    tokens = tokens_expr(F.col(text_col))
    n_tokens = F.size(tokens)
    total_token_chars = F.aggregate(
        tokens, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return df.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars_actual"),
        F.round(
            F.when(n_tokens > 0, total_token_chars / n_tokens).otherwise(F.lit(0.0)), 6
        ).alias("mean_token_len"),
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + keep/drop flag (Gopher-rule style):
    length bounds, mean word length bounds, alpha ratio, stopword hits.

    DuckDB twin uses identical arithmetic; ratios rounded to 6dp."""
    text = F.col(text_col)
    tokens = tokens_expr(text)
    n_tokens = F.size(tokens)
    n_chars = F.length(text)
    alpha_chars = F.length(F.regexp_replace(text, r"[^a-zA-Z]", ""))
    punct_chars = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    mean_wl = F.when(n_tokens > 0, n_chars.cast("double") / n_tokens).otherwise(0.0)
    en_stops = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_hits = F.size(F.filter(tokens, lambda t: F.array_contains(en_stops, F.lower(t))))
    # the gate is the single shared definition — curate() applies the
    # same expression, so threshold tuning can't diverge
    keep = quality_keep_expr(text)
    return df.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        F.round(alpha_chars.cast("double") / F.greatest(n_chars, F.lit(1)), 6).alias(
            "alpha_ratio"
        ),
        F.round(punct_chars.cast("double") / F.greatest(n_chars, F.lit(1)), 6).alias(
            "punct_ratio"
        ),
        F.round(mean_wl, 6).alias("mean_word_len"),
        stop_hits.cast("long").alias("stopword_hits"),
        keep.alias("keep"),
    )


def _lang_hits(tokens: Column, lang: str) -> Column:
    stops = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens, lambda t: F.array_contains(stops, F.lower(t))))


def lang_pred_expr(text: Column) -> Column:
    """argmax of stopword hits across {en,de,fr,es}, 'und' when
    all-zero; ties break by fixed language order en>de>fr>es
    (greatest-with-struct trick; oracle mirrors it). Pure Column expr —
    a free rider on any scan."""
    tokens = tokens_expr(text)
    scored = F.greatest(
        *[
            F.struct(
                _lang_hits(tokens, lang).alias("hits"),
                F.lit(rank).alias("rank"),
                F.lit(lang).alias("lang"),
            )
            for rank, lang in [(4, "en"), (3, "de"), (2, "fr"), (1, "es")]
        ]
    )
    return F.when(scored["hits"] > 0, scored["lang"]).otherwise(F.lit("und"))


def quality_keep_expr(text: Column) -> Column:
    """The Gopher-style keep gate as a standalone Column expr (same
    arithmetic as quality_features)."""
    tokens = tokens_expr(text)
    n_tokens = F.size(tokens)
    n_chars = F.length(text)
    alpha_chars = F.length(F.regexp_replace(text, r"[^a-zA-Z]", ""))
    mean_wl = F.when(n_tokens > 0, n_chars.cast("double") / n_tokens).otherwise(0.0)
    return (
        (n_tokens >= 5)
        & (mean_wl >= 2.0)
        & (mean_wl <= 12.0)
        & (alpha_chars.cast("double") / F.greatest(n_chars, F.lit(1)) >= 0.6)
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred) — see lang_pred_expr."""
    return df.select("doc_id", lang_pred_expr(F.col(text_col)).alias("lang_pred"))


def vocabulary(
    df: DataFrame, min_count: int = 1, lowercase: bool = True, text_col: str = "text"
) -> DataFrame:
    """Corpus token-frequency table (token, n) — the tokenizer-training
    precursor. explode → hash agg with map-side partials: the shuffle
    carries one (token, partial-count) row per distinct token per
    partition, bounded by vocabulary size, not corpus size."""
    tok = F.explode(tokens_expr(F.col(text_col))).alias("token")
    tokens = df.select(tok)
    if lowercase:
        tokens = tokens.select(F.lower("token").alias("token"))
    return (
        tokens.groupBy("token")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
    )


def bigrams(
    df: DataFrame, min_count: int = 1, lowercase: bool = True, text_col: str = "text"
) -> DataFrame:
    """Corpus adjacent-token-pair frequency table (bigram, n) — the
    merge-candidate precursor for BPE-style tokenizer training. The
    pairs expand IN-ROW (sequence over the token array, no self-join);
    the shuffle is the same vocabulary-bounded hash agg as
    vocabulary()."""
    toks = tokens_expr(F.col(text_col))
    if lowercase:
        toks = F.transform(toks, F.lower)
    # materialize the token array as a column FIRST: element-wise
    # access on the inlined tokenize expression re-evaluates the whole
    # split per element (measured 9 s where this takes 0.6 s). Then
    # one zip_with over shifted slices is a single O(n) pass.
    ts = F.col("ts")
    pairs = F.zip_with(
        F.slice(ts, 1, F.greatest(F.size(ts) - 1, F.lit(0))),
        F.slice(ts, 2, F.greatest(F.size(ts) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        df.select(toks.alias("ts"))
        .select(F.explode(pairs).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
    )


def tfidf_top_terms(
    df: DataFrame, k: int = 3, text_col: str = "text"
) -> DataFrame:
    """Per-doc top-k terms by tf·(N/df) — the raw-rational tf-idf
    variant (no log), so the weight is exact integer arithmetic in
    doubles and any engine reproduces it bit-for-bit (a log-based idf
    differs across libm implementations in the last ulp).

    Plan shape: one (doc_id, token) count agg (tf), one token-keyed
    distinct-doc agg (df — bounded by vocabulary), a token join of two
    NARROW tables, and a per-doc top-k window. N rides along as a
    broadcast scalar (cross join of a 1-row agg). Ties break on the
    token string."""
    from pyspark.sql import Window

    toks = df.select(
        "doc_id", F.explode(F.transform(tokens_expr(F.col(text_col)), F.lower)).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = toks.distinct().groupBy("token").agg(F.count("*").alias("df"))
    n_docs = df.select(F.countDistinct("doc_id").alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(F.col("weight").desc(), F.col("token"))
    return (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf").cast("double") * F.col("n_docs") / F.col("df"), 6
            ).alias("weight"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "token", "weight", F.col("rank").cast("long").alias("rank"))
    )


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals per doc: distinct-token ratio
    (low ⇒ looping/boilerplate text) and top-bigram mass fraction
    (share of tokens covered by the single most-repeated adjacent
    pair). distinct ratio is pure in-row; the bigram mode needs one
    (doc_id, bigram) hash agg + a per-doc max — the shuffle carries
    short hash-aggregated rows, never text. Docs with <2 tokens report
    0.0 top-bigram mass via the left join restore."""
    toks = F.transform(tokens_expr(F.col(text_col)), F.lower)
    base = df.select("doc_id", toks.alias("ts")).select(
        "doc_id",
        "ts",
        F.size("ts").alias("n_tok"),
    )
    ts = F.col("ts")
    pairs = F.zip_with(
        F.slice(ts, 1, F.greatest(F.size(ts) - 1, F.lit(0))),
        F.slice(ts, 2, F.greatest(F.size(ts) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    # count on a 64-bit hash of the pair, not the string: the shuffle
    # then carries (long, long) rows instead of text (the packed-key
    # trick ngram_jaccard uses). An in-doc hash collision would need
    # ~2^32 distinct bigrams in ONE document — not a real corpus.
    top_bigram = (
        base.select("doc_id", F.explode(pairs).alias("bigram"))
        .select("doc_id", F.xxhash64("bigram").alias("bg_h"))
        .groupBy("doc_id", "bg_h")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"))
    )
    return (
        base.join(top_bigram, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tok").cast("long").alias("n_tokens"),
            F.when(
                F.col("n_tok") > 0,
                F.round(
                    F.size(F.array_distinct("ts")).cast("double") / F.col("n_tok"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("distinct_token_ratio"),
            F.when(
                F.col("n_tok") > 0,
                F.round(
                    F.coalesce(F.col("top_c"), F.lit(0)).cast("double")
                    * 2.0
                    / F.col("n_tok"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("top_bigram_frac"),
        )
    )


def line_repetition(
    df: DataFrame, delim: str = "\n", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_lines, dup_line_frac, dup_char_frac): Gopher's
    WITHIN-document line-repetition gates (Rae et al. 2021 §A1.1 —
    'duplicate line fraction' and 'duplicate line character
    fraction'), the standard filter for pages whose body is one nav
    block / cookie banner stamped over and over. Lines are the
    delim-split, trimmed, non-empty segments; dup_line_frac counts
    line OCCURRENCES beyond the first of each distinct value, and
    dup_char_frac the characters those occurrences carry — both
    exact-integer micro-unit ratios (half-up div, the repo's score
    discipline).

    Scale shape: pure in-row Column expressions over one text scan —
    no explode, no shuffle, nothing moves but the per-doc result row;
    at 100 TB this rides the extraction-output pass for free. Unlike
    repetition_features' top-bigram mode (which needs a hash agg),
    within-doc line stats never leave the row."""
    lines = F.filter(
        F.transform(
            F.split(F.col(text_col), F.lit(delim), -1), lambda x: F.trim(x)
        ),
        lambda x: F.length(x) > 0,
    )
    chars = lambda arr: F.aggregate(  # noqa: E731 — local expr builder
        arr, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    base = df.select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        F.size(F.array_distinct(lines)).cast("long").alias("n_distinct"),
        chars(lines).alias("total_chars"),
        chars(F.array_distinct(lines)).alias("distinct_chars"),
    )
    micro = (
        lambda num, den: F.when(
            F.col(den) > 0,
            F.expr(f"(2 * ({num}) * 1000000 + {den}) div (2 * {den})").cast(
                "double"
            )
            / F.lit(1000000.0),
        ).otherwise(F.lit(0.0))
    )
    return base.select(
        "doc_id",
        "n_lines",
        micro("n_lines - n_distinct", "n_lines").alias("dup_line_frac"),
        micro("total_chars - distinct_chars", "total_chars").alias(
            "dup_char_frac"
        ),
    )


# The required-stopword presence rule from Rae et al. 2021 §A1.1: a
# document must contain at least 2 of these 8 words. Frozen — the
# oracle SQL embeds the same list.
GOPHER_REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(
    df: DataFrame,
    delim: str = "\n",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """The full Gopher word-level quality rule set (Rae et al. 2021
    §A1.1) as exact micro-unit ratios plus the conjunction keep gate:

      * word count in [min_words, max_words]
      * mean word length in [3, 10] characters
      * '#' symbol-to-word ratio < 0.1 and '...' ratio < 0.1
      * < 90% of lines starting with a bullet ('-' / '*')
      * < 30% of lines ending with an ellipsis
      * >= 80% of words containing at least one alphabetic character
      * >= 2 distinct hits from the 8-word required-stopword list

    Complements line_repetition (the §A1.1 duplicate-line gates) and
    quality_features (the coarse legacy gate). Every ratio is an exact
    int64 half-up micro-unit division, so the keep comparisons agree
    bit-for-bit with the DuckDB twin regardless of threshold edges.

    Scale shape: pure in-row Column expressions — one text scan, zero
    Exchange; at 100 TB this rides the extraction-output pass for
    free, exactly like line_repetition."""
    text = F.col(text_col)
    tokens = tokens_expr(text)
    lower_toks = F.transform(tokens, lambda t: F.lower(t))
    lines = F.filter(
        F.transform(F.split(text, F.lit(delim), -1), lambda x: F.trim(x)),
        lambda x: F.length(x) > 0,
    )
    word_chars = F.aggregate(
        tokens, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    # '#' / '...' occurrence counts by length delta under non-overlapping
    # leftmost replace — identical semantics in Spark and DuckDB.
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    stop_hits = sum(
        (
            F.array_contains(lower_toks, w).cast("int")
            for w in GOPHER_REQUIRED_STOPWORDS
        ),
        F.lit(0),
    )
    base = df.select(
        "doc_id",
        F.size(tokens).cast("long").alias("n_words"),
        F.size(lines).cast("long").alias("n_lines"),
        word_chars.alias("word_chars"),
        n_hash.cast("long").alias("n_hash"),
        n_ellipsis.cast("long").alias("n_ellipsis"),
        F.size(F.filter(tokens, lambda t: t.rlike("[A-Za-z]")))
        .cast("long")
        .alias("alpha_words"),
        F.size(
            F.filter(
                lines,
                lambda x: F.startswith(x, F.lit("-")) | F.startswith(x, F.lit("*")),
            )
        )
        .cast("long")
        .alias("bullet_lines"),
        F.size(F.filter(lines, lambda x: F.endswith(x, F.lit("..."))))
        .cast("long")
        .alias("ellipsis_lines"),
        stop_hits.cast("long").alias("req_stop_hits"),
    )
    micro = (
        lambda num, den: F.when(
            F.col(den) > 0,
            F.expr(f"(2 * ({num}) * 1000000 + {den}) div (2 * {den})").cast(
                "double"
            )
            / F.lit(1000000.0),
        ).otherwise(F.lit(0.0))
    )
    feat = base.select(
        "doc_id",
        "n_words",
        micro("word_chars", "n_words").alias("mean_word_len"),
        micro("n_hash", "n_words").alias("hash_ratio"),
        micro("n_ellipsis", "n_words").alias("ellipsis_ratio"),
        micro("bullet_lines", "n_lines").alias("bullet_line_frac"),
        micro("ellipsis_lines", "n_lines").alias("ellipsis_line_frac"),
        micro("alpha_words", "n_words").alias("alpha_word_frac"),
        "req_stop_hits",
    )
    keep = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= 3.0)
        & (F.col("mean_word_len") <= 10.0)
        & (F.col("hash_ratio") < 0.1)
        & (F.col("ellipsis_ratio") < 0.1)
        & (F.col("bullet_line_frac") < 0.9)
        & (F.col("ellipsis_line_frac") < 0.3)
        & (F.col("alpha_word_frac") >= 0.8)
        & (F.col("req_stop_hits") >= 2)
    )
    return feat.select("*", keep.alias("keep"))


def c4_quality(
    df: DataFrame,
    delim: str = "\n",
    text_col: str = "text",
    min_sentences: int = 3,
    min_line_words: int = 5,
) -> DataFrame:
    """The C4 cleaning rule set (Raffel et al. 2020 §2.2) as exact
    in-row expressions: per-LINE filters (must end in terminal
    punctuation '.', '!' or '?'; must carry >= min_line_words words;
    lines mentioning 'javascript' are removed, not the page) and
    per-PAGE gates (drop pages containing '{', containing
    'lorem ipsum', or with fewer than min_sentences sentences left
    after line filtering — sentences counted as terminal punctuation
    marks in the kept text).

    Emits the kept-line counts, the page-gate flags, the md5 of the
    cleaned text (the narrow audit/oracle column — downstream readers
    re-derive the cleaned body from the same expression), and the
    conjunction keep. Completes the published-rule-set trio next to
    gopher_quality (word-level) and line_repetition (dup-line): a
    curation stack users can cite line-by-line against the papers.

    Scale shape: pure Column expressions, zero Exchange — rides the
    same text scan as the other gates."""
    text = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(text, F.lit(delim), -1), lambda x: F.trim(x)),
        lambda x: F.length(x) > 0,
    )
    terminal = lambda x: (  # noqa: E731 — local expr builder
        F.endswith(x, F.lit("."))
        | F.endswith(x, F.lit("!"))
        | F.endswith(x, F.lit("?"))
    )
    n_words = lambda x: F.size(  # noqa: E731
        F.filter(F.split(x, r"\s+"), lambda t: t != F.lit(""))
    )
    kept = F.filter(
        lines,
        lambda x: terminal(x)
        & (n_words(x) >= min_line_words)
        & ~F.contains(F.lower(x), F.lit("javascript")),
    )
    clean = F.array_join(kept, delim)
    n_sentences = F.length(clean) - F.length(
        F.regexp_replace(clean, r"[.!?]", "")
    )
    has_brace = F.contains(text, F.lit("{"))
    has_lorem = F.contains(F.lower(text), F.lit("lorem ipsum"))
    base = df.select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        n_sentences.cast("long").alias("n_sentences"),
        has_brace.alias("has_brace"),
        has_lorem.alias("has_lorem"),
        F.md5(clean).alias("clean_md5"),
    )
    keep = (
        (F.col("n_sentences") >= min_sentences)
        & ~F.col("has_brace")
        & ~F.col("has_lorem")
    )
    return base.select("*", keep.alias("keep"))


# GPT-2-flavoured pretokenizer shape: contractions, letter runs, digit
# runs, punctuation runs, whitespace collapsed away. ASCII classes only
# so Java (Spark) and RE2 (DuckDB) agree.
BPE_TOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens) — whitespace count plus the
    BPE-ish regex count (closer to real tokenizer budgets: punctuation
    and digit runs count separately).

    DuckDB twin: len(regexp_extract_all(text, pattern))."""
    return df.select(
        "doc_id",
        F.size(tokens_expr(F.col(text_col))).cast("long").alias("n_ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_PATTERN))
        .cast("long")
        .alias("n_bpe_tokens"),
    )


# Winnowing parameters (Schleimer et al., MOSS — public algorithm):
# k-gram rolling hashes, keep each window's minimum.
WINNOW_K = 8
WINNOW_WINDOW = 4
WINNOW_BASE = 257
WINNOW_MOD = 1_000_000_007
_POWS = [pow(WINNOW_BASE, WINNOW_K - 1 - j, WINNOW_MOD) for j in range(WINNOW_K)]


def winnowing_fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Rolling-hash document fingerprints via winnowing:
    h(i) = Σ_j code(c_{i+j})·B^{k-1-j} mod M over k-gram windows of the
    normalized text, then the min of each w-hash window, deduplicated →
    (doc_id, fp) rows.

    Plan: explode k-gram start positions (narrow ints), codegen'd hash
    arithmetic, sliding-window min via a ROWS BETWEEN frame, distinct.
    At 10^12 docs the explode is the cost — in production you'd fuse
    this into the extraction UDF; the relational form here doubles as
    the cross-engine oracle.

    DuckDB twin mirrors each stage (unicode() == ascii() on ASCII)."""
    norm = norm_text_expr(F.col(text_col))
    base = df.select("doc_id", norm.alias("nt")).filter(F.length("nt") >= WINNOW_K)

    # Everything in-row (zero shuffles before the final explode): codes
    # array → rolling hashes → sliding minima → distinct. The codes
    # array is let-bound via the array+transform trick so CollapseProject
    # cannot inline the char-split into every per-position lambda.
    def hashes_from(codes):
        def hash_at(i):
            h = None
            for j in range(WINNOW_K):
                term = (F.element_at(codes, i + j) * F.lit(_POWS[j])) % WINNOW_MOD
                h = term if h is None else (h + term) % WINNOW_MOD
            return h

        return F.transform(
            F.sequence(F.lit(1), F.size(codes) - (WINNOW_K - 1)), hash_at
        )

    codes_expr = F.transform(
        F.filter(F.split(F.col("nt"), ""), lambda c: c != F.lit("")),
        lambda c: F.ascii(c).cast("long"),
    )
    hashes = F.flatten(F.transform(F.array(codes_expr), hashes_from)).alias("hs")

    def minima(hs):
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(hs)),
                lambda i: F.array_min(F.slice(hs, i, WINNOW_WINDOW)),
            )
        )

    fps = F.flatten(F.transform(F.array(hashes), minima))
    # per-doc dedup already happened in-row (array_distinct) and doc_ids
    # are unique, so no row-level distinct — the plan has NO shuffle.
    return base.select("doc_id", F.explode(fps).alias("fp"))


def fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fp_full, fp_prefix64) — md5 of normalized text, plus the
    first 16 hex chars as a compact 64-bit-equivalent key for joins."""
    fp = F.md5(norm_text_expr(F.col(text_col)))
    return df.select(
        "doc_id", fp.alias("fp_full"), F.substring(fp, 1, 16).alias("fp_prefix64")
    )
