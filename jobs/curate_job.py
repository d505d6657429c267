#!/usr/bin/env python
"""spark-submit entry point for the training-data curation pipeline —
the second production launch surface next to jobs/extract_job.py
(north_rule mode: `spark-submit --py-files` on a multi-executor
cluster).

    cd /root/repo && zip -qr /tmp/crh_spark.zip claude_readability_hook_spark
    spark-submit --py-files /tmp/crh_spark.zip jobs/curate_job.py \
        --input  /path/to/documents-dir \
        --output /path/to/out \
        [--cap-per-source 10000] [--val-fraction 0.1] [--langs en] \
        [--dedup minhash|exact|none] [--manifest-only] \
        [--decontaminate bench.parquet] [--redact-pii] [--scrub-spans 3] \
        [--lm-filter 500.0] [--dsir-target-lang en --dsir-scale 2] \
        [--boilerplate-filter 0.5] [--line-dup-filter 0.3] [--gopher-filter]

Pipeline (all narrow joins on doc_id — text never travels past the
gate): curation gate (language ∧ quality ∧ not-exact-dup-loser) →
deterministic train/val split → per-source cap → optional benchmark
decontamination (n-gram overlap, broadcast bench side) → manifest
parquet, and unless --manifest-only, the kept TRAIN documents as gzip
JSONL shards — optionally span-scrubbed (C4-style duplicated-span
removal) and PII-redacted on the way out. Prints one JSON summary
line."""

from __future__ import annotations

import argparse
import json


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="documents parquet dir/file")
    parser.add_argument("--output", required=True)
    parser.add_argument("--cap-per-source", type=int, default=100_000)
    parser.add_argument("--val-fraction", type=float, default=0.1)
    parser.add_argument("--langs", default="en", help="comma-separated keep set")
    parser.add_argument("--shard-rows", type=int, default=100_000)
    parser.add_argument("--manifest-only", action="store_true")
    parser.add_argument(
        "--decontaminate",
        metavar="BENCH_PARQUET",
        help="drop docs sharing any 5-gram with this benchmark set "
        "(GPT-3/Gopher-style n-gram decontamination)",
    )
    parser.add_argument(
        "--redact-pii",
        action="store_true",
        help="replace emails/IPs/phones with typed tokens in exported text",
    )
    parser.add_argument(
        "--scrub-spans",
        type=int,
        metavar="MIN_DOCS",
        default=0,
        help="remove 10-token spans recurring in >= MIN_DOCS docs "
        "(C4-style duplicated-span scrub) before export",
    )
    parser.add_argument(
        "--boilerplate-filter",
        type=float,
        metavar="MAX_FRAC",
        default=None,
        help="drop docs whose within-source boilerplate 5-gram position "
        "coverage exceeds MAX_FRAC (cross-document template gate, "
        "operators/boilerplate.py)",
    )
    parser.add_argument(
        "--line-dup-filter",
        type=float,
        metavar="MAX_FRAC",
        default=None,
        help="drop docs whose duplicate-line character fraction exceeds "
        "MAX_FRAC (Gopher within-doc repetition gate, "
        "textstats.line_repetition)",
    )
    parser.add_argument(
        "--gopher-filter",
        action="store_true",
        help="apply the full Gopher word-level rule-set keep gate "
        "(word-count/mean-word-length bounds, symbol ratios, "
        "bullet/ellipsis line fractions, alpha-word fraction, "
        "required stopwords — textstats.gopher_quality)",
    )
    parser.add_argument(
        "--c4-filter",
        action="store_true",
        help="apply the C4 page gates (brace / lorem-ipsum / fewer "
        "than 3 sentences after the terminal-punctuation line "
        "filter — textstats.c4_quality)",
    )
    parser.add_argument(
        "--lm-filter",
        type=float,
        metavar="MAX_SCORE",
        default=None,
        help="drop docs whose mean add-one bigram surprise exceeds "
        "MAX_SCORE (CCNet-style LM perplexity gate; the reference LM "
        "trains on a deterministic 1/4 hash-sample of the input)",
    )
    parser.add_argument(
        "--dsir-target-lang",
        metavar="LANG",
        default=None,
        help="DSIR importance resampling toward this language's "
        "distribution: train target + corpus bigram LMs on hash-"
        "samples, weight docs by surprise ratio, keep each doc with "
        "probability min(1, weight/scale) via the RNG-free hash draw",
    )
    parser.add_argument(
        "--dsir-scale",
        type=int,
        default=2,
        help="DSIR acceptance normalizer (weight/scale capped at 1)",
    )
    parser.add_argument(
        "--mixture-report",
        action="store_true",
        help="with --dsir-target-lang: write mixture/ parquet — the "
        "per-language DoReMi doc-mass mixture (dsir_domain_mixture) "
        "converted to the TOKEN budget via byte-BPE tokenizer "
        "fertility (fertility_token_mixture): the data-mixture "
        "decision table (domain, n_docs, mixture_share, "
        "tokens_per_doc, token_share)",
    )
    parser.add_argument(
        "--pack",
        type=int,
        metavar="SEQ_LEN",
        default=0,
        help="export packed token sequences of this fixed length "
        "(concat + split with doc-boundary metadata) instead of "
        "one-doc-per-record shards",
    )
    parser.add_argument(
        "--tokenizer-root",
        metavar="PATH",
        default=None,
        help="with --pack: pack the LEARNED tokenizer's symbol stream "
        "instead of whitespace tokens, using the merge-table artifact "
        "published at PATH (manifest snapshots); if nothing is "
        "published there yet, train k merges on the input and publish "
        "the artifact first (train-once, reuse-everywhere)",
    )
    parser.add_argument("--bpe-merges", type=int, default=8, metavar="K")
    parser.add_argument(
        "--tokenizer-family",
        choices=("bpe", "unigram"),
        default="bpe",
        help="with --tokenizer-root: which tokenizer family to "
        "train/load/pack with (word-level BPE merges or the "
        "unigram-LM piece vocabulary)",
    )
    parser.add_argument(
        "--domain-filter",
        action="store_true",
        help="apply the per-registrable-domain governance gate "
        "(operators/domains.py): drop docs whose domain is "
        "blocklisted, too small, dup-heavy, low-quality, or "
        "PII-dense",
    )
    parser.add_argument(
        "--domain-col",
        default="source",
        help="column holding the host/domain key (default: source — "
        "crawl corpora pass their host column here)",
    )
    parser.add_argument(
        "--domain-blocklist",
        default="",
        help="comma-separated registrable domains to drop outright",
    )
    parser.add_argument("--domain-min-docs", type=int, default=1)
    parser.add_argument(
        "--domain-max-dup-micro",
        type=int,
        default=500_000,
        help="max exact-dup micro-rate per domain (1e6 = all dups)",
    )
    args = parser.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("crh-spark-curate").getOrCreate()

    from claude_readability_hook_spark.operators.curation import curate
    from claude_readability_hook_spark.operators.sampling import (
        cap_per_source,
        train_val_split,
    )

    docs = spark.read.parquet(args.input)
    langs = [s.strip() for s in args.langs.split(",") if s.strip()]

    gates = curate(docs.select("doc_id", "text"))
    kept = gates.filter(
        F.col("quality_keep")
        & F.col("lang_pred").isin(langs)
        & ~F.col("is_dup_loser")
    ).select("doc_id", "lang_pred")
    split = train_val_split(docs, val_fraction=args.val_fraction).select(
        "doc_id", "split"
    )
    capped = cap_per_source(docs, max_docs=args.cap_per_source)

    n_contaminated = 0
    n_lm_dropped = 0
    manifest = kept.join(split, "doc_id").join(capped, "doc_id").select(
        "doc_id", "source", "lang_pred", "split"
    )
    if args.lm_filter is not None:
        # CCNet-style model-based gate: score every doc against the
        # hash-sample-trained bigram LM, keep the unsurprising ones
        from claude_readability_hook_spark.operators.lmfilter import (
            lm_surprise_scores,
        )

        scores = lm_surprise_scores(docs.select("doc_id", "text"))
        calm_ids = scores.filter(F.col("lm_score") <= args.lm_filter).select(
            "doc_id"
        )
        before = manifest.count()
        manifest = manifest.join(calm_ids, "doc_id", "left_semi")
        n_lm_dropped = before - manifest.count()
    n_boiler_dropped = 0
    if args.boilerplate_filter is not None:
        # cross-document template gate: per-source boilerplate 5-gram
        # table (df-thresholded, broadcast) → per-doc position coverage
        from claude_readability_hook_spark.operators.boilerplate import (
            boilerplate_scores,
        )

        bscores = boilerplate_scores(docs.select("doc_id", "text", "source"))
        calm = bscores.filter(
            F.col("boiler_score") <= args.boilerplate_filter
        ).select("doc_id")
        before = manifest.count()
        manifest = manifest.join(calm, "doc_id", "left_semi")
        n_boiler_dropped = before - manifest.count()
    n_linedup_dropped = 0
    if args.line_dup_filter is not None:
        # Gopher within-doc repetition gate — pure in-row expressions,
        # a free rider on the text scan
        from claude_readability_hook_spark.operators.textstats import (
            line_repetition,
        )

        lr = line_repetition(docs.select("doc_id", "text"))
        calm = lr.filter(
            F.col("dup_char_frac") <= args.line_dup_filter
        ).select("doc_id")
        before = manifest.count()
        manifest = manifest.join(calm, "doc_id", "left_semi")
        n_linedup_dropped = before - manifest.count()
    n_gopher_dropped = 0
    if args.gopher_filter:
        # the full Gopher word-level conjunction gate — pure in-row,
        # another free rider on the text scan
        from claude_readability_hook_spark.operators.textstats import (
            gopher_quality,
        )

        gq = gopher_quality(docs.select("doc_id", "text"))
        calm = gq.filter(F.col("keep")).select("doc_id")
        before = manifest.count()
        manifest = manifest.join(calm, "doc_id", "left_semi")
        n_gopher_dropped = before - manifest.count()
    n_c4_dropped = 0
    if args.c4_filter:
        # C4 page gates — same free-rider shape as the Gopher gate
        from claude_readability_hook_spark.operators.textstats import (
            c4_quality,
        )

        cq = c4_quality(docs.select("doc_id", "text"))
        calm = cq.filter(F.col("keep")).select("doc_id")
        before = manifest.count()
        manifest = manifest.join(calm, "doc_id", "left_semi")
        n_c4_dropped = before - manifest.count()
    n_domain_dropped = 0
    if args.domain_filter:
        # domain governance gate: per-registrable-domain signals
        # (dup rate, quality rate, PII density, LM surprise) and a
        # blocklist — docs on failing domains leave the manifest
        from claude_readability_hook_spark.operators.domains import domain_gate

        blocklist = tuple(
            s.strip() for s in args.domain_blocklist.split(",") if s.strip()
        )
        gated = domain_gate(
            docs.select("doc_id", F.col(args.domain_col), "text"),
            host_col=args.domain_col,
            min_docs=args.domain_min_docs,
            max_dup_micro=args.domain_max_dup_micro,
            blocklist=blocklist,
        )
        keep_ids = gated.filter(F.col("domain_keep")).select("doc_id")
        before = manifest.count()
        manifest = manifest.join(keep_ids, "doc_id", "left_semi")
        n_domain_dropped = before - manifest.count()
    n_dsir_dropped = 0
    if args.dsir_target_lang:
        # DSIR domain-mixing stage: resample toward the target-domain
        # distribution by the two-LM surprise ratio (deterministic
        # acceptance draw — resume-safe like every gate here)
        from claude_readability_hook_spark.operators.lmfilter import (
            dsir_importance_weights,
            dsir_resample_expr,
        )

        texts = docs.select("doc_id", "text")
        weights = dsir_importance_weights(
            texts, docs.filter(F.col("lang") == args.dsir_target_lang)
        )
        kept_ids = weights.filter(
            dsir_resample_expr(scale=args.dsir_scale)
        ).select("doc_id")
        before = manifest.count()
        manifest = manifest.join(kept_ids, "doc_id", "left_semi")
        n_dsir_dropped = before - manifest.count()
        if args.mixture_report:
            # the token-budget view of the mixture: DoReMi doc-mass
            # shares × byte-BPE tokens-per-doc (fertility), normalized
            from claude_readability_hook_spark.operators.bpetrain import (
                learn_byte_bpe_merges,
                tokenizer_fertility,
            )
            from claude_readability_hook_spark.operators.lmfilter import (
                dsir_domain_mixture,
                fertility_token_mixture,
            )

            mix = dsir_domain_mixture(
                docs.select("doc_id", "lang", "text"),
                docs.filter(F.col("lang") == args.dsir_target_lang),
                domain_col="lang",
            )
            merges = learn_byte_bpe_merges(docs, k=args.bpe_merges)
            fert = tokenizer_fertility(docs, merges, group_col="lang")
            fertility_token_mixture(mix, fert).write.mode(
                "overwrite"
            ).parquet(f"{args.output}/mixture")
    if args.decontaminate:
        # benchmark side broadcasts; contaminated docs leave the
        # manifest entirely (the conservative policy)
        from claude_readability_hook_spark.operators.decontam import decontaminate

        bench = spark.read.parquet(args.decontaminate).select("doc_id", "text")
        flags = decontaminate(docs.select("doc_id", "text"), bench, n=5)
        clean_ids = flags.filter(~F.col("contaminated")).select("doc_id")
        before = manifest.count()
        manifest = manifest.join(clean_ids, "doc_id", "left_semi")
        n_contaminated = before - manifest.count()
    manifest.write.mode("overwrite").parquet(f"{args.output}/manifest")
    manifest = spark.read.parquet(f"{args.output}/manifest")

    n_total = docs.count()
    n_manifest = manifest.count()
    n_train = manifest.filter(F.col("split") == "train").count()

    n_shards = None
    if not args.manifest_only:
        # shard the TRAIN documents; reuse the content-addressed JSONL
        # exporter by shaping docs as single-text-span rows
        from claude_readability_hook_spark.sources.export import export_jsonl_shards

        doc_texts = docs.select("doc_id", "text")
        if args.scrub_spans:
            from claude_readability_hook_spark.operators.spandedup import (
                scrub_duplicated_spans,
            )

            doc_texts = scrub_duplicated_spans(doc_texts, min_docs=args.scrub_spans)
        if args.redact_pii:
            from claude_readability_hook_spark.operators.pii import redact_text_expr

            doc_texts = doc_texts.select(
                "doc_id", redact_text_expr(F.col("text")).alias("text")
            )
        if args.pack:
            # packed-sequence export: fixed token-budget sequences with
            # doc-boundary metadata (operators/packing.py), sharded by
            # source — the training-ready layout
            from claude_readability_hook_spark.sources.export import (
                export_bpe_packed_shards,
                export_packed_shards,
            )

            train_texts = (
                manifest.filter(F.col("split") == "train")
                .select("doc_id", "source")
                .join(doc_texts, "doc_id")
            )
            if args.tokenizer_root and args.tokenizer_family == "unigram":
                # unigram-family packing: same train-once-publish
                # lifecycle, pieces instead of merge symbols
                from claude_readability_hook_spark.operators.unigram import (
                    load_unigram_artifact,
                    save_unigram_artifact,
                    train_unigram,
                )
                from claude_readability_hook_spark.sources.export import (
                    export_unigram_packed_shards,
                )

                try:
                    vocab = load_unigram_artifact(spark, args.tokenizer_root)
                except FileNotFoundError:
                    vocab = train_unigram(docs.select("doc_id", "text"))
                    save_unigram_artifact(vocab, args.tokenizer_root)
                    vocab = load_unigram_artifact(spark, args.tokenizer_root)
                n_shards = export_unigram_packed_shards(
                    train_texts, vocab, f"{args.output}/packed",
                    seq_len=args.pack,
                )
            elif args.tokenizer_root:
                # learned-tokenizer packing: load the published merge
                # artifact, or train-and-publish on first run
                from claude_readability_hook_spark.operators.bpetrain import (
                    learn_bpe_merges,
                    load_bpe_artifact,
                    save_bpe_artifact,
                )

                try:
                    merges = load_bpe_artifact(spark, args.tokenizer_root)
                except FileNotFoundError:
                    merges = learn_bpe_merges(
                        docs.select("doc_id", "text"), k=args.bpe_merges
                    )
                    save_bpe_artifact(merges, args.tokenizer_root)
                    merges = load_bpe_artifact(spark, args.tokenizer_root)
                n_shards = export_bpe_packed_shards(
                    train_texts, merges, f"{args.output}/packed",
                    seq_len=args.pack,
                )
            else:
                n_shards = export_packed_shards(
                    train_texts, f"{args.output}/packed", seq_len=args.pack
                )
            print(
                json.dumps(
                    {
                        "docs_in": n_total,
                        "manifest_rows": n_manifest,
                        "train_rows": n_train,
                        "val_rows": n_manifest - n_train,
                        "contaminated_dropped": n_contaminated,
                        "lm_dropped": n_lm_dropped,
                        "dsir_dropped": n_dsir_dropped,
                        "domain_dropped": n_domain_dropped,
                        "packed_sequences": n_shards,
                        "seq_len": args.pack,
                    }
                )
            )
            spark.stop()
            return
        train_docs = (
            manifest.filter(F.col("split") == "train")
            .select("doc_id", "lang_pred")
            .join(doc_texts, "doc_id")
            .select(
                "doc_id",
                F.col("lang_pred").alias("title"),
                F.lit("curate").alias("engine"),
                F.lit(1.0).alias("score"),
                F.lit(True).alias("success"),
                F.array(
                    F.struct(
                        F.lit("text").alias("kind"),
                        F.col("text").alias("text"),
                        F.lit("").alias("media_ref"),
                        F.lit(0).alias("offset"),
                    )
                ).alias("spans"),
            )
        )
        n_shards = export_jsonl_shards(
            train_docs, f"{args.output}/shards", max_rows_per_shard=args.shard_rows
        )

    print(
        json.dumps(
            {
                "docs_in": n_total,
                "manifest_rows": n_manifest,
                "train_rows": n_train,
                "val_rows": n_manifest - n_train,
                "contaminated_dropped": n_contaminated,
                "lm_dropped": n_lm_dropped,
                "dsir_dropped": n_dsir_dropped,
                "domain_dropped": n_domain_dropped,
                "boiler_dropped": n_boiler_dropped,
                "linedup_dropped": n_linedup_dropped,
                "gopher_dropped": n_gopher_dropped,
                "c4_dropped": n_c4_dropped,
                "export_shards": n_shards,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
