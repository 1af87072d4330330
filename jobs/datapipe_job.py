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
        [--steps quality,repetition,langid,pii,exact_dedup,minhash_dedup] \
        [--min-quality 0.3] [--langs en] [--minhash-threshold 0.8] \
        [--benchmark <parquet>] [--partitions 4096]

Writes <output>/documents (surviving, possibly redacted rows) and
<output>/report (one row per step: docs in, docs out). Step order is
the order given in --steps; every step is a pure DataFrame transform,
so Catalyst pipelines the cheap expression filters into one pass and
the only shuffles are the ones the dedup steps inherently need.
"""

from __future__ import annotations

import argparse

ALL_STEPS = [
    "quality", "repetition", "langid", "pii",
    "exact_dedup", "minhash_dedup", "decontam",
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
    ap.add_argument("--benchmark", default=None,
                    help="eval-set parquet for the decontam step")
    ap.add_argument("--decontam-max-overlap", type=float, default=0.1)
    ap.add_argument("--partitions", type=int, default=None)
    args = ap.parse_args()

    steps = [s.strip() for s in args.steps.split(",") if s.strip()]
    unknown = [s for s in steps if s not in ALL_STEPS]
    if unknown:
        ap.error(f"unknown steps {unknown}; choose from {ALL_STEPS}")
    if "decontam" in steps and not args.benchmark:
        ap.error("--benchmark is required for the decontam step")

    from pyspark.sql import functions as F

    from powergraph_spark import get_spark
    from powergraph_spark.datapipe import (
        dedup_exact,
        decontaminate,
        lang_id,
        minhash_dedup,
        quality_score,
        repetition_filter,
    )
    from powergraph_spark.datapipe.text import redact_pii

    spark = get_spark(app_name="datapipe-job",
                      shuffle_partitions=args.partitions)
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
        elif step == "pii":
            docs = docs.withColumn(args.text_col, redact_pii(text))
        elif step == "exact_dedup":
            docs = dedup_exact(docs, text_col=args.text_col,
                               id_col=args.id_col)
        elif step == "minhash_dedup":
            docs = minhash_dedup(docs, threshold=args.minhash_threshold,
                                 text_col=args.text_col, id_col=args.id_col)
        elif step == "decontam":
            bench = spark.read.parquet(args.benchmark)
            docs = decontaminate(
                docs, bench, max_overlap_frac=args.decontam_max_overlap,
                id_col=args.id_col, text_col=args.text_col,
            )
        n_out = docs.count()
        report.append((step, n_in, n_out))
        print(f"[datapipe] {step}: {n_in} -> {n_out}")
        n_in = n_out

    docs.write.mode("overwrite").parquet(f"{args.output}/documents")
    spark.createDataFrame(
        report, "step string, docs_in long, docs_out long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{args.output}/report")
    print(f"[datapipe] wrote {n_in} docs to {args.output}/documents")
    spark.stop()


if __name__ == "__main__":
    main()
