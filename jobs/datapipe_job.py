"""Cluster entry point: the training-data cleaning pipeline over a
documents table — quality/language/repetition filtering, PII
redaction, exact + MinHash near-dup removal, and optional benchmark
decontamination, as ONE spark-submit job.

The reference has no text pipeline (its payload is the link graph);
this is the datapipe surface (powergraph_spark.datapipe) behind the
same CLI shape as the repo's other jobs.

Usage:
    spark-submit --py-files powergraph_spark.zip jobs/datapipe_job.py \
        --documents <parquet with (doc_id, text, ...)> --output <dir> \
        [--steps quality,repetition,c4,langid,pii,line_dedup,exact_dedup,minhash_dedup,span_filter,span_rewrite,ppl,dsir,strat,semdedup] \
        [--min-quality 0.3] [--langs en] [--minhash-threshold 0.8] \
        [--benchmark <parquet>] [--qsample-seed qsample] \
        [--ppl-cutoffs -3.42,-3.39] [--dsir-target <parquet>] \
        [--strat-col lang --strat-n 10000] [--embeddings <parquet>] \
        [--bpe-merges 1000] \
        [--split-fractions train=0.9,val=0.05,test=0.05] [--partitions 4096]

Writes <output>/documents (surviving, possibly redacted rows;
partitioned by `split` when --split-fractions is given) and
<output>/report (one row per step: docs in, docs out). Step order is
the order given in --steps; every step is a pure DataFrame transform,
so Catalyst pipelines the cheap expression filters into one pass and
the only shuffles are the ones the dedup steps inherently need.
"""

from __future__ import annotations

import argparse

ALL_STEPS = [
    "quality", "repetition", "c4", "langid", "pii",
    "line_dedup", "exact_dedup", "minhash_dedup", "span_filter",
    "span_rewrite", "qlr", "decontam", "qsample",
    "ppl", "dsir", "strat", "semdedup",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument(
        "--steps",
        default="quality,repetition,langid,pii,exact_dedup,minhash_dedup",
        help=f"comma-separated subset of {ALL_STEPS}, applied in order",
    )
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--langs", default="en",
                    help="comma-separated lang_id values to keep")
    ap.add_argument("--minhash-threshold", type=float, default=0.8)
    ap.add_argument("--span-k", type=int, default=8,
                    help="word k-gram size for the span_filter /"
                         " span_rewrite steps")
    ap.add_argument("--span-max-dup-frac", type=float, default=0.5,
                    help="span_filter drops docs whose duplicated-span"
                         " token fraction exceeds this")
    ap.add_argument("--qlr-label-col", default=None,
                    help="0/1 column the qlr step trains its hashed-BoW"
                         " logistic-regression quality filter on"
                         " (required for the qlr step)")
    ap.add_argument("--qlr-dim", type=int, default=64)
    ap.add_argument("--qlr-steps", type=int, default=20)
    ap.add_argument("--qlr-min-prob", type=float, default=0.5)
    ap.add_argument("--benchmark", default=None,
                    help="eval-set parquet for the decontam step")
    ap.add_argument("--decontam-max-overlap", type=float, default=0.1)
    ap.add_argument("--qsample-seed", default="qsample",
                    help="seed string for the qsample step's md5 draw")
    ap.add_argument("--split-fractions", default=None,
                    help="e.g. train=0.9,val=0.05,test=0.05 — adds a"
                         " deterministic `split` column and partitions"
                         " the output by it")
    ap.add_argument("--ppl-cutoffs", default=None,
                    help="c1,c2 avg_logprob cutoffs for the ppl step"
                         " (fit offline via datapipe.text.ppl_cutoffs)")
    ap.add_argument("--ppl-keep", default="head,middle",
                    help="buckets the ppl step keeps")
    ap.add_argument("--dsir-target", default=None,
                    help="target-domain parquet for the dsir step")
    ap.add_argument("--dsir-n", type=int, default=100000,
                    help="docs the dsir step selects")
    ap.add_argument("--dsir-dim", type=int, default=8192)
    ap.add_argument("--strat-col", default=None,
                    help="stratum column for the strat step")
    ap.add_argument("--strat-n", type=int, default=10000,
                    help="docs per stratum the strat step keeps")
    ap.add_argument("--embeddings", default=None,
                    help="parquet with (vec_id, embedding) keyed by"
                         " the doc id — required for the semdedup step")
    ap.add_argument("--semdedup-k", type=int, default=1024)
    ap.add_argument("--semdedup-threshold", type=float, default=0.95)
    ap.add_argument("--bpe-merges", type=int, default=None,
                    help="when set, learns this many BPE merges on the"
                         " SURVIVING docs and writes <output>/bpe_merges")
    ap.add_argument("--pack-budget", type=int, default=None,
                    help="token budget per training sequence; when set,"
                         " writes <output>/sequences with the (shard,"
                         " bin) packing key per doc")
    ap.add_argument("--pack-shards", type=int, default=1024)
    ap.add_argument("--partitions", type=int, default=None)
    args = ap.parse_args()

    fractions = None
    if args.split_fractions:
        try:
            fractions = {
                k: float(v)
                for k, v in (
                    kv.split("=") for kv in args.split_fractions.split(",")
                )
            }
        except ValueError:
            ap.error("--split-fractions must be name=frac[,name=frac...]")

    steps = [s.strip() for s in args.steps.split(",") if s.strip()]
    unknown = [s for s in steps if s not in ALL_STEPS]
    if unknown:
        ap.error(f"unknown steps {unknown}; choose from {ALL_STEPS}")
    if "decontam" in steps and not args.benchmark:
        ap.error("--benchmark is required for the decontam step")
    if "qlr" in steps and not args.qlr_label_col:
        ap.error("--qlr-label-col is required for the qlr step")
    if "ppl" in steps and not args.ppl_cutoffs:
        ap.error("--ppl-cutoffs is required for the ppl step")
    if "dsir" in steps and not args.dsir_target:
        ap.error("--dsir-target is required for the dsir step")
    if "strat" in steps and not args.strat_col:
        ap.error("--strat-col is required for the strat step")
    if "semdedup" in steps and not args.embeddings:
        ap.error("--embeddings is required for the semdedup step")

    from powergraph_spark import get_spark

    spark = get_spark(app_name="datapipe-job",
                      shuffle_partitions=args.partitions)
    run(spark, args, steps, fractions)
    spark.stop()


def run(spark, args, steps, fractions=None) -> None:
    """Pipeline body, spark-session-injectable (tests drive it with
    the shared local session; main() owns session lifecycle)."""
    from pyspark.sql import functions as F

    from powergraph_spark.datapipe import (
        c4_line_filter,
        dedup_exact,
        decontaminate,
        hash_split,
        lang_id,
        line_dedup,
        minhash_dedup,
        quality_sample,
        quality_score,
        repetition_filter,
        span_dedup_filter,
        span_dedup_rewrite,
    )
    from powergraph_spark.datapipe.text import redact_pii

    docs = spark.read.parquet(args.documents)
    if args.partitions:
        docs = docs.repartition(args.partitions, args.id_col)
    text = F.col(args.text_col)

    report: list[tuple[str, int, int]] = []
    n_in = docs.count()
    for step in steps:
        if step == "quality":
            docs = docs.filter(quality_score(text) >= args.min_quality)
        elif step == "repetition":
            docs = docs.filter(repetition_filter(text))
        elif step == "langid":
            keep = [s.strip() for s in args.langs.split(",") if s.strip()]
            docs = docs.filter(lang_id(text).isin(keep))
        elif step == "c4":
            filt = c4_line_filter(
                docs, id_col=args.id_col, text_col=args.text_col
            )
            docs = docs.drop(args.text_col).join(
                filt.where("kept").select(
                    args.id_col,
                    F.col("text_clean").alias(args.text_col),
                ),
                args.id_col,
            )
        elif step == "pii":
            docs = docs.withColumn(args.text_col, redact_pii(text))
        elif step == "line_dedup":
            deduped = line_dedup(
                docs, id_col=args.id_col, text_col=args.text_col
            )
            docs = docs.drop(args.text_col).join(
                deduped.where(F.col("n_kept") > 0).select(
                    args.id_col,
                    F.col("text_clean").alias(args.text_col),
                ),
                args.id_col,
            )
        elif step == "exact_dedup":
            docs = dedup_exact(docs, text_col=args.text_col,
                               id_col=args.id_col)
        elif step == "minhash_dedup":
            docs = minhash_dedup(docs, threshold=args.minhash_threshold,
                                 text_col=args.text_col, id_col=args.id_col)
        elif step == "span_filter":
            docs = span_dedup_filter(
                docs, max_dup_frac=args.span_max_dup_frac,
                text_col=args.text_col, id_col=args.id_col,
                k=args.span_k,
            )
        elif step == "span_rewrite":
            rewritten = span_dedup_rewrite(
                docs, text_col=args.text_col, id_col=args.id_col,
                k=args.span_k,
            )
            docs = docs.drop(args.text_col).join(rewritten, args.id_col)
        elif step == "qlr":
            from powergraph_spark.datapipe import (
                quality_lr_filter, train_quality_lr,
            )

            weights = train_quality_lr(
                docs, F.col(args.qlr_label_col),
                text_col=args.text_col, dim=args.qlr_dim,
                steps=args.qlr_steps,
            )
            docs = quality_lr_filter(
                docs, weights, min_prob=args.qlr_min_prob,
                text_col=args.text_col,
            )
        elif step == "decontam":
            bench = spark.read.parquet(args.benchmark)
            docs = decontaminate(
                docs, bench, max_overlap_frac=args.decontam_max_overlap,
                id_col=args.id_col, text_col=args.text_col,
            )
        elif step == "qsample":
            docs = quality_sample(
                docs, quality_score(text),
                id_col=args.id_col, seed=args.qsample_seed,
            ).drop("u", "w")
        elif step == "ppl":
            from powergraph_spark.datapipe import ppl_buckets

            c1, c2 = (float(x) for x in args.ppl_cutoffs.split(","))
            keep = [s.strip() for s in args.ppl_keep.split(",")]
            b = ppl_buckets(
                docs, (c1, c2), id_col=args.id_col,
                text_col=args.text_col,
            )
            docs = docs.join(
                b.filter(F.col("bucket").isin(keep)).select(args.id_col),
                args.id_col,
            )
        elif step == "dsir":
            from powergraph_spark.datapipe import importance_resample

            target = spark.read.parquet(args.dsir_target)
            docs = importance_resample(
                docs, target, n=args.dsir_n, dim=args.dsir_dim,
                id_col=args.id_col, text_col=args.text_col,
            ).drop("iw_score", "gumbel_key")
        elif step == "strat":
            from powergraph_spark.datapipe import stratified_sample

            docs = stratified_sample(
                docs, args.strat_col, n_per=args.strat_n,
                id_col=args.id_col,
            ).drop("u")
        elif step == "semdedup":
            from powergraph_spark.datapipe import semantic_dedup

            emb = spark.read.parquet(args.embeddings)
            flags = semantic_dedup(
                emb, k=args.semdedup_k,
                threshold=args.semdedup_threshold,
            )
            docs = docs.join(
                flags.filter("keep").select(
                    F.col("id").alias(args.id_col)
                ),
                args.id_col,
            )
        n_out = docs.count()
        report.append((step, n_in, n_out))
        print(f"[datapipe] {step}: {n_in} -> {n_out}")
        n_in = n_out

    writer = docs.write.mode("overwrite")
    if fractions:
        docs = hash_split(docs, id_col=args.id_col, fractions=fractions)
        writer = docs.write.mode("overwrite").partitionBy("split")
    writer.parquet(f"{args.output}/documents")
    if args.bpe_merges:
        from powergraph_spark.datapipe import bpe_train

        res = bpe_train(docs, n_merges=args.bpe_merges,
                        text_col=args.text_col)
        spark.createDataFrame(
            [(r + 1, a, b, c) for r, (a, b, c) in enumerate(res.merges)],
            "rank INT, left STRING, right STRING, freq BIGINT",
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{args.output}/bpe_merges"
        )
        print(f"[datapipe] wrote {len(res.merges)} BPE merges to "
              f"{args.output}/bpe_merges")
    if args.pack_budget:
        from powergraph_spark.datapipe import pack_sequences

        pack_sequences(
            docs, budget=args.pack_budget, n_shards=args.pack_shards,
            id_col=args.id_col, text_col=args.text_col,
        ).write.mode("overwrite").parquet(f"{args.output}/sequences")
        print(f"[datapipe] wrote packing keys to {args.output}/sequences")
    spark.createDataFrame(
        report, "step string, docs_in long, docs_out long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{args.output}/report")
    print(f"[datapipe] wrote {n_in} docs to {args.output}/documents")


if __name__ == "__main__":
    main()
