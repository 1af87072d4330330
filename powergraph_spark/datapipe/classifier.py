"""Trainable quality classifier for training-data curation:
hashed bag-of-words features + L2-regularized logistic regression,
trained by deterministic full-batch gradient descent as pure
DataFrame transforms (the fastText / CCNet "Wikipedia-vs-crawl"
filter shape, re-expressed Spark-first).

No reference counterpart (the reference's payload is the link graph);
the training loop reuses the repo's toolkit discipline:
- per-step driver state is ONE (dim+1)-length weight literal folded
  into the plan (the `_const_matrix` style of kmeans.py/svd.py) — no
  join against a weights table, no Python in the row path;
- the gradient is a posexplode partial-agg: the shuffle per GD step is
  P * (dim+1) rows, independent of corpus size (kmeans.py's update
  shape);
- randomness-free: weights start at zero, features are md5-hashed
  token buckets, so any executor count reproduces the same model
  bit-for-bit (modulo float summation order, bounded by rounding).

100 TB: one corpus pass per GD step; features can be computed once and
cached/written. dim is the model capacity knob — the dense
array<double> per doc costs 8*dim bytes; for dim beyond ~4k switch to
the sparse (doc, bucket, count) layout and an explode-join dot product
(same gradient agg).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens


def hash_bucket(tok: Column, dim: int) -> Column:
    """Feature bucket of a token: first 8 md5 hex nibbles as u32, mod
    dim — the repo's standard md5-draw (clean._md5_uniform), so a SQL
    oracle replays it nibble-by-nibble."""
    return (
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")
        % F.lit(dim)
    ).cast("int")


def hashed_bow(col: Column, dim: int = 64,
               normalize: bool = False) -> Column:
    """Dense hashed bag-of-words (array<double>, length dim+1): bucket
    counts plus a trailing constant-1 bias slot, so downstream linear
    algebra is a single zip_with. O(n_tokens * dim) JVM work per doc —
    sized for the small dims a quality LR needs.

    normalize=True divides counts by the doc's token count (L1),
    bounding per-doc feature magnitude — use it on real corpora with
    long documents so full-batch GD at lr~0.5 doesn't overshoot; the
    raw-count default is what the `qlr2` oracle pins."""
    toks = tokens(col)
    buckets = F.transform(toks, lambda t: hash_bucket(t, dim))
    counts = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: F.size(F.filter(buckets, lambda b: b == d))
        .cast("double"),
    )
    if normalize:
        n = F.size(toks).cast("double")
        counts = F.when(
            n > 0, F.transform(counts, lambda c: c / n)
        ).otherwise(counts)
    return F.concat(counts, F.array(F.lit(1.0)))


def _dot_literal(feat: Column, weights: list[float]) -> Column:
    """feat · weights with the weights folded in as one literal."""
    wlit = F.array(*[F.lit(float(w)) for w in weights])
    return F.aggregate(
        F.zip_with(feat, wlit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def train_quality_lr(
    docs: DataFrame,
    label: Column,
    text_col: str = "text",
    dim: int = 64,
    steps: int = 20,
    lr: float = 0.5,
    l2: float = 0.0,
    normalize: bool = False,
) -> list[float]:
    """Full-batch GD for logistic regression P(y=1|x) = sigmoid(x·w):
    w_j <- w_j - lr * (mean_i (p_i - y_i) * x_ij + l2 * w_j), bias in
    the trailing slot (unregularized). Returns the (dim+1) weights.

    Each step is ONE job: per-doc residual from the weight literal,
    then posexplode(features) partial-agg of (index, resid * x) — the
    only shuffle is the dim+1-key aggregation."""
    feats = docs.select(
        hashed_bow(F.col(text_col), dim, normalize).alias("x"),
        label.cast("double").alias("y"),
    )
    feats = feats.persist()
    n = feats.count()
    w = [0.0] * (dim + 1)
    for _ in range(steps):
        z = _dot_literal(F.col("x"), w)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        contrib = feats.select(
            F.posexplode(
                F.transform(F.col("x"), lambda xj: (p - F.col("y")) * xj)
            ).alias("j", "g")
        )
        grad_rows = (
            contrib.groupBy("j").agg(F.sum("g").alias("g")).collect()
        )
        grad = [0.0] * (dim + 1)
        for r in grad_rows:
            grad[r["j"]] = r["g"] / n
        w = [
            wj - lr * (gj + (l2 * wj if j < dim else 0.0))
            for j, (wj, gj) in enumerate(zip(w, grad))
        ]
    feats.unpersist()
    return w


def predict_quality_lr(
    docs: DataFrame,
    weights: list[float],
    text_col: str = "text",
    prob_col: str = "lr_prob",
    normalize: bool = False,
) -> DataFrame:
    """Score docs with a trained model: adds `prob_col` = sigmoid(x·w).
    Pure JVM expression from the weight literal — composes with
    quality_sample / filters without any join. `normalize` must match
    training."""
    dim = len(weights) - 1
    z = _dot_literal(hashed_bow(F.col(text_col), dim, normalize), weights)
    return docs.withColumn(
        prob_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    )


def quality_lr_filter(
    docs: DataFrame,
    weights: list[float],
    min_prob: float = 0.5,
    text_col: str = "text",
    normalize: bool = False,
) -> DataFrame:
    """Keep docs the classifier scores >= min_prob."""
    return (
        predict_quality_lr(docs, weights, text_col, normalize=normalize)
        .filter(F.col("lr_prob") >= min_prob)
        .drop("lr_prob")
    )
