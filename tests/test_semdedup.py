"""SemDeDup semantic dedup vs an independent numpy replica of the
same deterministic contract (k-means route + within-cluster cosine
dominance). No reference counterpart — datapipe extension, see
powergraph_spark/datapipe/semdedup.py docstring."""

from __future__ import annotations

import numpy as np
from pyspark.sql import Row

from powergraph_spark.datapipe.semdedup import (
    semantic_dedup,
    semantic_dedup_kept,
)

from test_kmeans import _np_kmeans


def _np_semdedup(X, ids, k, rounds, thr):
    """Brute-force replica: farthest-init Lloyd (shared replica), then
    drop x iff some same-cluster y with cos(x,y) >= thr has a strictly
    smaller (sqdist-to-centroid, id)."""
    assign, centers = _np_kmeans(X.copy(), ids.copy(), k, rounds)
    d2 = {
        i: ((X[list(ids).index(i)] - centers[assign[i]]) ** 2).sum()
        for i in ids.tolist()
    }
    norm = np.sqrt((X * X).sum(axis=1))
    keep = {}
    for i_pos, i in enumerate(ids.tolist()):
        dropped = False
        for j_pos, j in enumerate(ids.tolist()):
            if assign[i] != assign[j]:
                continue
            if not (d2[j] < d2[i] or (d2[j] == d2[i] and j < i)):
                continue
            denom = norm[i_pos] * norm[j_pos]
            cos = (X[i_pos] @ X[j_pos]) / denom if denom > 0 else 0.0
            if cos >= thr:
                dropped = True
                break
        keep[i] = not dropped
    return keep


def _fixture(seed=7, n_per=25, k=3, dim=6):
    """Gaussian blobs plus planted near-duplicates: every 5th point
    gets a barely-perturbed twin (cos > 0.999)."""
    rng = np.random.RandomState(seed)
    mus = rng.randn(k, dim) * 10
    X = np.concatenate([mus[i] + rng.randn(n_per, dim) for i in range(k)])
    twins = X[::5] + rng.randn(len(X[::5]), dim) * 1e-3
    X = np.concatenate([X, twins])
    ids = np.arange(len(X))
    return X.astype(np.float64), ids


def test_semdedup_matches_numpy(spark):
    X, ids = _fixture()
    df = spark.createDataFrame(
        [Row(vec_id=int(i), embedding=[float(x) for x in X[i]])
         for i in ids]
    )
    out = semantic_dedup(
        df, k=3, threshold=0.99, kmeans_rounds=3, init="farthest"
    ).collect()
    exp = _np_semdedup(X, ids, k=3, rounds=3, thr=0.99)
    got = {r["id"]: r["keep"] for r in out}
    assert got == exp
    # the planted twins actually exercise the drop path
    assert sum(not v for v in got.values()) >= len(X[::10])


def test_semdedup_kept_rows_and_parallelism_invariance(spark):
    X, ids = _fixture(seed=13)
    rows = [Row(vec_id=int(i), embedding=[float(x) for x in X[i]])
            for i in ids]
    a = semantic_dedup(
        spark.createDataFrame(rows).repartition(2),
        k=3, threshold=0.99, kmeans_rounds=2, init="farthest",
    ).collect()
    b = semantic_dedup(
        spark.createDataFrame(rows).repartition(16),
        k=3, threshold=0.99, kmeans_rounds=2, init="farthest",
    ).collect()
    fa = sorted((r["id"], r["cluster"], r["keep"]) for r in a)
    fb = sorted((r["id"], r["cluster"], r["keep"]) for r in b)
    assert fa == fb

    kept = semantic_dedup_kept(
        spark.createDataFrame(rows), k=3, threshold=0.99,
        kmeans_rounds=2, init="farthest",
    )
    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    assert kept_ids == {i for i, c, kp in fa if kp}
    # original columns survive
    assert set(kept.columns) == {"vec_id", "embedding"}


def test_semdedup_parallel_init_path(spark):
    """The k-means|| init (scale path) also produces a valid flag
    table: all ids present, keeps are a strict subset under a lower
    threshold than under threshold=1.01 (nothing can exceed cos 1)."""
    X, ids = _fixture(seed=29)
    df = spark.createDataFrame(
        [Row(vec_id=int(i), embedding=[float(x) for x in X[i]])
         for i in ids]
    )
    loose = semantic_dedup(df, k=3, threshold=0.9, kmeans_rounds=2,
                           init="parallel").collect()
    none = semantic_dedup(df, k=3, threshold=1.01, kmeans_rounds=2,
                          init="parallel").collect()
    assert {r["id"] for r in loose} == set(ids.tolist())
    assert all(r["keep"] for r in none)
    kept_loose = {r["id"] for r in loose if r["keep"]}
    assert kept_loose <= {r["id"] for r in none if r["keep"]}
    assert len(kept_loose) < len(ids)
