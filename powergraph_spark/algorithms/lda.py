"""Collapsed Gibbs LDA over the doc x word bipartite graph.

Reference: /root/reference/toolkits/topic_modeling/cgs_lda.cpp — the
graph is bipartite (documents, words) with one edge per unique
(doc, word) pair carrying a vector of per-occurrence topic assignments
(:361-407); the sampler (:520-549) visits every occurrence, removes its
current assignment from the doc/word/global topic counts, computes

    prob[t] = (ALPHA + n_dt) * (BETA + n_wt) / (BETA * NWORDS + n_t)

and draws the new assignment from that multinomial; a global
aggregator maintains GLOBAL_TOPIC_COUNT (:666-692). The reference
engine samples asynchronously with stale counts — convergence of the
chain is statistical, not per-step deterministic.

Spark mapping — BSP-DETERMINIZED Jacobi sampling, the same
determinization the repo's sgd() applied to sgd.cpp's visit order:

- State is ONE occurrence-level DataFrame (doc, word, occ, z):
  exploding the reference's per-edge assignment vector to rows keeps
  every superstep a pure DataFrame pipeline (no per-edge Python).
- A superstep recomputes EVERY occurrence's assignment from the
  PREVIOUS superstep's counts, with each occurrence excluding exactly
  its own current assignment from n_dt / n_wt / n_t (the reference's
  decrement, :530-536, applied Jacobi-style instead of sequentially).
- The multinomial draw is a DETERMINISTIC md5-seeded uniform per
  (seed, iteration, doc, word, occ) — byte-identical in any engine, so
  runs are reproducible at any parallelism and a DuckDB oracle can
  replay the chain exactly.
- Count tables are plain aggregations: n_dt = groupBy(doc), n_wt =
  groupBy(word) (k conditional sums each -> one array column), n_t =
  one global agg collected to the driver and folded into the
  probability expression as k literals (the reference's
  GLOBAL_TOPIC_COUNT aggregator, :666-692). Probabilities and the
  cumulative-sum draw are pure JVM expressions — k is small, rows are
  (ids, k-array).

Per-superstep plan: two partial-agg shuffles (doc-counts, word-counts)
+ two shuffle-hash joins of those k-arrays back onto the occurrence
rows — all shuffles are occurrence-row or vertex-row sized, nothing
quadratic, no Python in the loop. State materializes exactly once per
superstep (eager localCheckpoint) with an Observation counting
assignment changes riding the same job (the reference's nchanges
gather, :418-426).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation

from ..gas import truncate_plan
from pyspark.sql import functions as F

_U_DEN = float(16 ** 8)


def _dlit(x: float) -> str:
    """SQL DOUBLE literal: plain decimal literals parse as DECIMAL in
    both Spark and DuckDB — an exponent forces DOUBLE in both, keeping
    the whole probability pipeline in IEEE doubles so the DuckDB oracle
    matches bit for bit."""
    s = repr(float(x))
    return s if "e" in s else s + "E0"


def doc_word_tokens(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 3,
) -> DataFrame:
    """(doc, word, occ) occurrence rows: the engine's shared whitespace
    tokenizer, lowercased and stripped to [a-z] runs, words shorter
    than ``min_len`` dropped; ``occ`` numbers repeats of a (doc, word)
    pair 1..cnt (the reference's per-edge assignment-vector slots)."""
    from ..datapipe.text import tokens

    words = (
        docs.select(
            F.col(doc_col).alias("doc"),
            F.explode(tokens(F.col(text_col))).alias("raw"),
        )
        .select(
            "doc",
            F.regexp_replace(F.lower("raw"), "[^a-z]", "").alias("word"),
        )
        .filter(F.length("word") >= min_len)
    )
    return (
        words.groupBy("doc", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "doc", "word",
            F.explode(F.sequence(F.lit(1), F.col("cnt"))).alias("occ"),
        )
    )


def _uniform_expr(seed: str, tag: str) -> str:
    """Deterministic uniform in [0,1) from md5(seed:tag:doc:word:occ) —
    first 8 hex digits / 16^8 (the same draw family as
    warp.bond_percolation, byte-identical across engines)."""
    s = (
        f"concat('{seed}:', '{tag}:', doc, ':', word, ':', occ)"
    )
    return (
        f"(CAST(conv(substring(md5({s}), 1, 8), 16, 10) AS DOUBLE)"
        f" / {_dlit(_U_DEN)})"
    )


@dataclass
class LDAResult:
    assignments: DataFrame        # (doc, word, occ, z)
    doc_topics: DataFrame         # (doc, counts array<long>[k])
    word_topics: DataFrame        # (word, counts array<long>[k])
    topic_totals: list[int]       # GLOBAL_TOPIC_COUNT at the end
    iterations: int
    nchanges: list[int] = field(default_factory=list)


def lda(
    tokens_df: DataFrame,
    k: int = 10,
    alpha: float = 0.1,
    beta: float = 0.1,
    iterations: int = 10,
    seed: str = "lda",
    num_partitions: int | None = None,
) -> LDAResult:
    """Run ``iterations`` determinized collapsed-Gibbs supersteps over
    occurrence rows (doc, word, occ). Returns the final assignments
    plus the standard count summaries. alpha/beta/k follow cgs_lda.cpp
    option names (:199-230)."""
    counts_of = lambda col: F.array(  # noqa: E731 — k conditional sums
        *[
            F.sum((F.col(col) == t).cast("long")).alias(f"t{t}")
            for t in range(k)
        ]
    )
    W = tokens_df.select("word").distinct().count()

    z = tokens_df.selectExpr(
        "doc", "word", "occ",
        f"CAST(floor({_uniform_expr(seed, 'init')} * {k}) AS INT) AS z",
    )
    if num_partitions:
        z = z.repartition(num_partitions, "doc")
    z = truncate_plan(z)

    nchanges: list[int] = []
    wbeta = float(W * beta)
    for it in range(1, iterations + 1):
        dt = z.groupBy("doc").agg(counts_of("z").alias("dt"))
        wt = z.groupBy("word").agg(counts_of("z").alias("wt"))
        nt = list(z.agg(counts_of("z").alias("nt")).first()["nt"])

        joined = (
            z.join(dt.hint("shuffle_hash"), "doc")
            .join(wt.hint("shuffle_hash"), "word")
        )
        # p[t] with the occurrence's own assignment removed from every
        # count (cgs_lda.cpp:530-543); identical operation order in the
        # DuckDB oracle so doubles match bit for bit.
        p_exprs = [
            f"((element_at(dt, {t + 1}) - s{t} + {_dlit(alpha)})"
            f" * (element_at(wt, {t + 1}) - s{t} + {_dlit(beta)})"
            f" / ({_dlit(nt[t])} - s{t} + {_dlit(wbeta)})) AS p{t}"
            for t in range(k)
        ]
        s_exprs = [
            f"(CASE WHEN z = {t} THEN 1 ELSE 0 END) AS s{t}"
            for t in range(k)
        ]
        total = " + ".join(f"p{t}" for t in range(k))
        cum, branches = [], []
        for t in range(k - 1):
            cum.append(f"p{t}")
            branches.append(
                f"WHEN u * ({total}) < {' + '.join(cum)} THEN {t}"
            )
        z_case = f"(CASE {' '.join(branches)} ELSE {k - 1} END)"

        step = (
            joined.selectExpr(
                "doc", "word", "occ", "z", "dt", "wt",
                f"{_uniform_expr(seed, str(it))} AS u",
                *s_exprs,
            )
            .selectExpr("doc", "word", "occ", "z", "u", *p_exprs)
            .selectExpr(
                "doc", "word", "occ", "z",
                f"CAST({z_case} AS INT) AS z_new",
            )
        )
        obs = Observation()
        step = step.observe(
            obs,
            F.sum((F.col("z_new") != F.col("z")).cast("long")).alias("n"),
        )
        z = truncate_plan(step.selectExpr(
            "doc", "word", "occ", "z_new AS z"
        ))
        nchanges.append(int(obs.get["n"] or 0))

    doc_topics = z.groupBy("doc").agg(counts_of("z").alias("counts"))
    word_topics = z.groupBy("word").agg(counts_of("z").alias("counts"))
    totals = [int(x) for x in z.agg(counts_of("z").alias("nt")).first()["nt"]]
    return LDAResult(
        assignments=z,
        doc_topics=doc_topics,
        word_topics=word_topics,
        topic_totals=totals,
        iterations=iterations,
        nchanges=nchanges,
    )


def top_words(result: LDAResult, n: int = 10) -> DataFrame:
    """(topic, word, count, rank<=n): the reference's per-topic top-word
    report (cgs_lda.cpp top_words aggregator), a posexplode + windowed
    top-n (WindowGroupLimit keeps the shuffle partial under Spark 4)."""
    from pyspark.sql import Window

    exploded = result.word_topics.select(
        "word", F.posexplode("counts").alias("topic", "count")
    ).filter(F.col("count") > 0)
    w = Window.partitionBy("topic").orderBy(
        F.desc("count"), F.asc("word")
    )
    return (
        exploded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .select("topic", "word", "count", "rank")
    )


def log_likelihood(
    result: LDAResult, alpha: float, beta: float, W: int, k: int
) -> float:
    """Joint log-likelihood of (words | topics) + (topics), the
    reference's likelihood_aggregator formulas (cgs_lda.cpp:727-747).
    Collects the (|W| x k) and (|D| x k) count summaries — fine at test
    scale; the 100 TB path would fold the lgamma sums into one Arrow
    pass over each summary table."""
    from math import lgamma

    nt = result.topic_totals
    lik_wgt = k * (lgamma(W * beta) - W * lgamma(beta))
    lik_wgt -= sum(lgamma(nt[t] + W * beta) for t in range(k))
    for row in result.word_topics.collect():
        lik_wgt += sum(lgamma(c + beta) for c in row["counts"])
    lik_t = 0.0
    n_docs = 0
    for row in result.doc_topics.collect():
        cs = row["counts"]
        lik_t += sum(lgamma(c + alpha) for c in cs)
        lik_t -= lgamma(sum(cs) + k * alpha)
        n_docs += 1
    lik_t += n_docs * (lgamma(k * alpha) - k * lgamma(alpha))
    return lik_wgt + lik_t
