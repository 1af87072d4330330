"""Byte-pair-encoding merge training over a corpus (tokenizer prep).

Public knowledge: Sennrich, Haddow & Birch, "Neural Machine
Translation of Rare Words with Subword Units" (ACL 2016) — iterate:
count adjacent symbol pairs over the word-frequency table, merge the
most frequent pair everywhere (greedy leftmost, non-overlapping),
repeat. Words start as characters plus an end-of-word marker.

Reference parity: no counterpart in the reference engine; datapipe
extension (SURVEY.md section 2.9) completing the tokenizer-training
surface next to corpus_ngram_counts (vocabulary statistics).

Scale posture (100 TB): the corpus is touched ONCE — a word-frequency
groupBy whose output (the distinct-word vocab table) is what every
merge iteration scans; by Heaps' law that table is orders of magnitude
smaller than the corpus and is the classic single-node BPE trainer's
working set, here kept distributed. Each merge = one pair-count job
(explode adjacent pairs -> partial-agg sum -> TakeOrdered top-1, so
only P*|distinct pairs| partials shuffle) + one pure-JVM fold that
re-segments the vocab rows in place; localCheckpoint truncates the
per-iteration lineage exactly like the GAS superstep loop.
Determinism: ties on pair count break lexicographically (a, b), so
results are parallelism-invariant and SQL-replayable.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

END_OF_WORD = "</w>"


def _chars(word: Column) -> Column:
    """Character symbols of a word plus the end-of-word marker.
    (split-then-drop-empties is the composition DuckDB's RE2 can
    mirror — it has no lookahead.)"""
    cs = F.filter(F.split(word, ""), lambda x: x != "")
    return F.concat(cs, F.array(F.lit(END_OF_WORD)))


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct<a,b>> of adjacent symbol pairs (overlapping, the
    standard get_stats counting)."""
    n = F.size(syms)
    return F.zip_with(
        F.slice(syms, 1, n - 1),
        F.slice(syms, 2, n - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )


def merge_pair(syms: Column, a: str, b: str) -> Column:
    """Replace every adjacent (a, b) with the fused symbol, greedy
    leftmost non-overlapping (in 'aaa' with pair (a,a) only the first
    two fuse). One ordered fold, pure JVM: the accumulator carries the
    rebuilt prefix plus the one pending symbol."""
    fused = a + b
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    )

    def step(acc: Column, s: Column) -> Column:
        take = (
            acc["prev"].isNotNull()
            & (acc["prev"] == F.lit(a))
            & (s == F.lit(b))
        )
        return (
            F.when(take, F.struct(
                F.concat(acc["out"], F.array(F.lit(fused))).alias("out"),
                F.lit(None).cast("string").alias("prev"),
            ))
            .when(acc["prev"].isNull(), F.struct(
                acc["out"].alias("out"), s.alias("prev"),
            ))
            .otherwise(F.struct(
                F.concat(acc["out"], F.array(acc["prev"])).alias("out"),
                s.alias("prev"),
            ))
        )

    def finish(acc: Column) -> Column:
        return F.when(acc["prev"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["prev"]))
        )

    return F.aggregate(syms, init, step, finish)


@dataclass
class BpeResult:
    merges: list[tuple[str, str, int]]  # (left, right, pair_count) by rank
    vocab: DataFrame  # (word, cnt, syms) segmented under all merges


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The one corpus-sized pass: distinct whitespace words with
    frequencies, seeded as character symbols + end-of-word marker."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .count()
        .select("word", F.col("count").alias("cnt"),
                _chars(F.col("word")).alias("syms"))
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> BpeResult:
    """Learn ``n_merges`` BPE merges. Stops early when no pair occurs
    twice. Each iteration scans only the vocab table."""
    vocab = word_vocab(docs, text_col).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            vocab.select("cnt", F.explode(
                _adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or int(top[0]["c"]) < 2:
            break
        a, b, c = top[0]["a"], top[0]["b"], int(top[0]["c"])
        merges.append((a, b, c))
        vocab = vocab.withColumn(
            "syms", merge_pair(F.col("syms"), a, b)
        ).localCheckpoint()
    return BpeResult(merges=merges, vocab=vocab)


def bpe_segment(col: Column, merges: list[tuple[str, str, int]]) -> Column:
    """Segment a text column's words under learned merges, applied in
    rank order — a chain of ``len(merges)`` folds per word, intended
    for modest merge counts (the expression tree grows linearly with
    the merge list; a production encoder would hold the merge ranks in
    a dictionary UDF instead). Returns array<array<string>>."""
    def seg_word(w: Column) -> Column:
        s = _chars(w)
        for a, b, _ in merges:
            s = merge_pair(s, a, b)
        return s

    return F.transform(tokens(col), seg_word)
