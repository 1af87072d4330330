"""DSIR-style importance resampling for domain-targeted data selection.

Public knowledge: Xie et al., "Data Selection for Language Models via
Importance Resampling" (DSIR, arXiv:2302.03169, NeurIPS 2023) — model
the target and raw corpora with hashed unigram distributions, score
each raw example by its log importance weight
``sum_tokens [ log p_target(bucket) - log p_raw(bucket) ]``, and
select top-n under Gumbel perturbation (Gumbel-top-k == sampling
without replacement proportional to the importance weights).

Reference parity: no counterpart in the reference engine; datapipe
extension (SURVEY.md section 2.9), complementing the trainable quality
classifier (classifier.py) — DSIR selects by DISTRIBUTION match to a
target domain, the LR classifier by a learned label.

Scale posture (100 TB): fitting = two hash-bucket groupBy counts whose
output is dim rows each (map-side combine collapses the token
explosion before the shuffle); the ONLY driver-side state is the
dim-vector of log-ratios (KB), folded back into the plan as ONE
constant literal (similarity._const_matrix discipline — no weights
join). Scoring is a per-token O(1) element_at fold, pure JVM;
selection is a Gumbel key + TakeOrdered top-n (no full sort shuffle).
Every stage is corpus-size-linear.

Determinism: buckets and Gumbel draws are the repo's standard
md5-nibble scheme (clean._md5_uniform / classifier.hash_bucket), so
the DuckDB oracle replays the whole pipeline — including the fold
ORDER of the per-doc score (list_reduce, not an order-free SUM, since
the top-n cutoff compares unrounded keys).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .classifier import hash_bucket
from .similarity import _const_matrix
from .text import tokens


def hashed_unigram_logratio(
    raw: DataFrame,
    target: DataFrame,
    dim: int = 64,
    alpha: float = 1.0,
    text_col: str = "text",
) -> list[float]:
    """Fit the two hashed-unigram distributions and return the
    per-bucket log importance weights
    ``log p_target(j) - log p_raw(j)`` (Laplace-``alpha`` smoothed).
    One dim-row groupBy per corpus; result is KB of driver state."""

    def counts(df: DataFrame) -> list[int]:
        rows = (
            df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
            .select(hash_bucket(F.col("tok"), dim).alias("j"))
            .groupBy("j")
            .count()
            .collect()
        )
        c = [0] * dim
        for r in rows:
            c[r["j"]] = int(r["count"])
        return c

    ct, cr = counts(target), counts(raw)
    tt, tr = float(sum(ct)), float(sum(cr))
    return [
        math.log((ct[j] + alpha) / (tt + alpha * dim))
        - math.log((cr[j] + alpha) / (tr + alpha * dim))
        for j in range(dim)
    ]


def importance_scores(
    docs: DataFrame,
    log_ratio: list[float],
    text_col: str = "text",
    out_col: str = "iw_score",
) -> DataFrame:
    """Per-doc log importance weight: an ordered left fold of
    ``log_ratio[bucket(token)]`` over the doc's tokens (empty doc ->
    0.0). The log-ratio vector rides as one constant-folded literal."""
    dim = len(log_ratio)
    lr = F.element_at(_const_matrix([log_ratio]), 1)
    buckets = F.transform(
        tokens(F.col(text_col)), lambda t: hash_bucket(t, dim)
    )
    score = F.aggregate(
        buckets, F.lit(0.0),
        lambda acc, b: acc + F.element_at(lr, b + 1),
    )
    return docs.withColumn(out_col, score)


def gumbel_key(id_col: str, seed: str = "dsir") -> Column:
    """Deterministic standard-Gumbel draw keyed on (seed, id): the
    repo's md5-u32 nibbles, shifted by +0.5 so u lies strictly inside
    (0, 1) and both logs stay finite."""
    u32 = F.expr(
        "CAST(conv(substring(md5(concat("
        f"'{seed}:', CAST({id_col} AS STRING))), 1, 8), 16, 10)"
        " AS DOUBLE)"
    )
    u = (u32 + F.lit(0.5)) / F.lit(4294967296.0)
    return -F.log(-F.log(u))


def importance_resample(
    raw: DataFrame,
    target: DataFrame,
    n: int,
    dim: int = 64,
    alpha: float = 1.0,
    seed: str = "dsir",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR selection: top-``n`` raw docs by Gumbel-perturbed log
    importance weight (ties -> lower id). Returns the selected rows
    with ``iw_score`` and ``gumbel_key`` appended; orderBy+limit
    compiles to TakeOrdered (per-partition partial top-n, no full
    sort shuffle)."""
    logr = hashed_unigram_logratio(
        raw, target, dim=dim, alpha=alpha, text_col=text_col
    )
    scored = importance_scores(raw, logr, text_col=text_col)
    keyed = scored.withColumn(
        "gumbel_key", F.col("iw_score") + gumbel_key(id_col, seed)
    )
    return keyed.orderBy(
        F.desc("gumbel_key"), F.asc(id_col)
    ).limit(n)
