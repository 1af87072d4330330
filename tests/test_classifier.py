"""Hashed-BoW logistic-regression quality classifier: numpy-replica
exactness, learning on separable corpora, and parallelism invariance."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from powergraph_spark.datapipe import (
    hashed_bow,
    predict_quality_lr,
    quality_lr_filter,
    train_quality_lr,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, "good clean prose sentence article " + f"n{i % 3}", 1)
            for i in range(30)]
    rows += [(100 + i, "spam junk click buy cheap " + f"m{i % 3}", 0)
             for i in range(30)]
    return spark.createDataFrame(rows, ["doc_id", "text", "y"])


def _numpy_replica(spark, docs, dim, steps, lr, l2=0.0):
    pdf = docs.select(
        hashed_bow(F.col("text"), dim).alias("x"),
        F.col("y").cast("double").alias("y"),
    ).toPandas()
    X = np.array(pdf["x"].tolist())
    y = pdf["y"].to_numpy()
    w = np.zeros(dim + 1)
    for _ in range(steps):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        g = (X.T @ (p - y)) / len(y)
        reg = np.concatenate([l2 * w[:dim], [0.0]])
        w = w - lr * (g + reg)
    return w


def test_lr_matches_numpy_replica(spark, corpus):
    w = train_quality_lr(corpus, F.col("y"), dim=16, steps=10, lr=0.5,
                         l2=0.01)
    wn = _numpy_replica(spark, corpus, 16, 10, 0.5, l2=0.01)
    assert np.abs(np.array(w) - wn).max() < 1e-8


def test_lr_learns_separable_corpus(spark, corpus):
    w = train_quality_lr(corpus, F.col("y"), dim=16, steps=30, lr=0.5)
    pred = predict_quality_lr(corpus, w)
    acc = pred.select(
        ((F.col("lr_prob") >= 0.5).cast("int") == F.col("y"))
        .cast("int").alias("ok")
    ).agg(F.avg("ok")).first()[0]
    assert acc >= 0.95
    kept = quality_lr_filter(corpus, w, min_prob=0.5)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert ids == set(range(30))


def test_lr_parallelism_invariant(spark, corpus):
    """Zero-init + md5 hashing + full-batch GD: 1 vs 7 partitions must
    agree (float-sum order only, bounded well below 1e-8)."""
    a = train_quality_lr(corpus.repartition(1), F.col("y"), dim=8,
                         steps=5, lr=0.5)
    b = train_quality_lr(corpus.repartition(7), F.col("y"), dim=8,
                         steps=5, lr=0.5)
    assert np.abs(np.array(a) - np.array(b)).max() < 1e-8


def test_hashed_bow_shape_and_bias(spark):
    df = spark.createDataFrame([(0, "a b a"), (1, "")],
                               ["doc_id", "text"])
    rows = {r["doc_id"]: r["x"] for r in df.select(
        "doc_id", hashed_bow(F.col("text"), 4).alias("x")).collect()}
    assert len(rows[0]) == 5 and rows[0][-1] == 1.0
    assert sum(rows[0][:4]) == 3.0  # three tokens counted
    assert rows[1] == [0.0, 0.0, 0.0, 0.0, 1.0]  # empty doc: bias only


def test_lr_normalized_features(spark, corpus):
    """normalize=True: L1-scaled counts still learn the separable
    corpus, and hashed_bow sums to 1 (+ bias) for non-empty docs."""
    from pyspark.sql import functions as F

    row = corpus.select(
        hashed_bow(F.col("text"), 8, normalize=True).alias("x")
    ).first()
    assert abs(sum(row["x"][:8]) - 1.0) < 1e-12 and row["x"][-1] == 1.0

    w = train_quality_lr(corpus, F.col("y"), dim=16, steps=60, lr=2.0,
                         normalize=True)
    pred = predict_quality_lr(corpus, w, normalize=True)
    acc = pred.select(
        ((F.col("lr_prob") >= 0.5).cast("int") == F.col("y"))
        .cast("int").alias("ok")
    ).agg(F.avg("ok")).first()[0]
    assert acc >= 0.95
