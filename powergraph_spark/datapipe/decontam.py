"""Benchmark decontamination: n-gram overlap between a training corpus
and a (small) evaluation/benchmark set.

The standard LLM-pipeline shape: before training, every corpus
document is checked for shared word n-grams with each benchmark
document; documents above an overlap threshold are flagged/dropped so
evaluation data never leaks into training.

Scale shape (corpus >> benchmark, always):
- benchmark side: explode to DISTINCT (bench_id, gram) — small, and
  broadcast into the probe join (the corpus is NEVER shuffled by
  gram);
- corpus side: explode to distinct (doc_id, gram) and stream through
  the broadcast-hash join + one partially-aggregated groupBy on
  (doc_id, bench_id).
A 100 TB corpus passes each gram through one codegen'd projection +
hash probe; the only shuffle is the per-(doc,bench) partial-count
merge, bounded by matches, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import word_shingles


def _grams(docs: DataFrame, id_col: str, text_col: str, k: int,
           out_id: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias(out_id),
        F.explode(word_shingles(F.col(text_col), k)).alias("gram"),
    )


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 5,
    min_overlap: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, bench_id, n_shared, bench_grams, overlap_frac):
    corpus docs sharing >= min_overlap distinct word k-grams with a
    benchmark doc; overlap_frac = n_shared / |benchmark doc's grams|
    (the direction that matters: how much of the EVAL doc is covered
    by the training doc)."""
    bench_grams = _grams(benchmark, id_col, text_col, k, "bench_id")
    bench_sizes = bench_grams.groupBy("bench_id").agg(
        F.count(F.lit(1)).alias("bench_grams")
    )
    corpus_grams = _grams(corpus, id_col, text_col, k, "doc_id")
    hits = (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_overlap)
    )
    return hits.join(F.broadcast(bench_sizes), "bench_id").select(
        "doc_id", "bench_id", "n_shared", "bench_grams",
        F.round(F.col("n_shared") / F.col("bench_grams"), 5)
        .alias("overlap_frac"),
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 5,
    max_overlap_frac: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop corpus docs whose k-gram coverage of ANY benchmark doc
    exceeds max_overlap_frac. Returns the surviving corpus rows
    (anti-join on the flagged id set — one broadcast-able semi-join)."""
    flagged = (
        contamination(corpus, benchmark, k=k, min_overlap=1,
                      id_col=id_col, text_col=text_col)
        .filter(F.col("overlap_frac") > max_overlap_frac)
        .select(F.col("doc_id").alias(id_col))
        .distinct()
    )
    return corpus.join(flagged, id_col, "left_anti")
