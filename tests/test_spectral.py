"""Spectral clustering vs ground truth on planted-partition graphs
(reference workflow: clustering/spectral_clustering.cpp)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from powergraph_spark.algorithms.spectral import (
    _chol_upper,
    _tri_inv,
    spectral_clustering,
    spectral_embedding,
)
from powergraph_spark.graph import Graph


def _two_cliques(spark, n=8, bridges=1, P=4):
    """Two n-cliques joined by ``bridges`` edges: ideal 2-partition."""
    edges = []
    for base in (0, n):
        edges += [
            (base + a, base + b)
            for a in range(n) for b in range(a + 1, n)
        ]
    edges += [(i, n + i) for i in range(bridges)]
    df = spark.createDataFrame(edges, "src long, dst long")
    return Graph.from_edges(df, num_partitions=P), n


def test_chol_and_tri_inv_match_numpy():
    rng = np.random.RandomState(11)
    for k in (1, 2, 3, 5):
        x = rng.randn(k + 2, k)
        g = (x.T @ x).tolist()
        r = _chol_upper(g, k, ridge=0.0)
        R = np.array(r)
        assert np.allclose(R.T @ R, g, rtol=1e-12, atol=1e-12)
        assert np.allclose(
            np.array(_tri_inv(r, k)), np.linalg.inv(R), rtol=1e-10
        )


def test_spectral_recovers_two_cliques(spark):
    g, n = _two_cliques(spark)
    res = spectral_clustering(g, k=2, power_iterations=15)
    got = {r["id"]: r["cluster"] for r in res.assignments.collect()}
    a = {i for i, c in got.items() if c == got[0]}
    b = set(got) - a
    assert {frozenset(a), frozenset(b)} == {
        frozenset(range(n)), frozenset(range(n, 2 * n)),
    }


def test_spectral_embedding_is_orthonormal(spark):
    g, n = _two_cliques(spark)
    emb = spectral_embedding(g, k=3, iterations=8)
    X = np.array([r["arr"] for r in emb.collect()])
    assert X.shape == (2 * n, 3)
    assert np.allclose(X.T @ X, np.eye(3), atol=1e-9)


def test_spectral_embedding_matches_dense_subspace(spark):
    """The embedding spans the dominant 2-subspace of M = I + An
    (== smallest-eigenvector subspace of the normalized Laplacian):
    projection residual onto the numpy eigenbasis ~ 0."""
    g, n = _two_cliques(spark, n=6)
    emb = spectral_embedding(g, k=2, iterations=40)
    ids = sorted(r["id"] for r in emb.collect())
    X = np.zeros((len(ids), 2))
    for r in emb.collect():
        X[r["id"]] = r["arr"]

    # dense normalized adjacency
    A = np.zeros((2 * n, 2 * n))
    for r in g.edges.select("src", "dst").collect():
        A[r["src"], r["dst"]] = 1.0
        A[r["dst"], r["src"]] = 1.0
    d = A.sum(axis=1)
    An = A / np.sqrt(np.outer(d, d))
    w, Q = np.linalg.eigh(np.eye(2 * n) + An)
    top = Q[:, np.argsort(w)[::-1][:2]]
    resid = X - top @ (top.T @ X)
    assert np.linalg.norm(resid) < 1e-6


def test_spectral_parallelism_and_weights(spark):
    g4, n = _two_cliques(spark, P=4)
    g9, _ = _two_cliques(spark, P=9)
    a = spectral_clustering(g4, k=2, power_iterations=10, kmeans_rounds=2)
    b = spectral_clustering(g9, k=2, power_iterations=10, kmeans_rounds=2)
    ga = sorted(map(tuple, a.assignments.collect()))
    gb = sorted(map(tuple, b.assignments.collect()))
    assert ga == gb

    # weighted: heavy bridge weights pull the two cliques together —
    # weight plumbing exercised end to end (still a valid 2-partition)
    edges = [(s, d, 1.0) for s, d in (
        (r["src"], r["dst"]) for r in g4.edges.collect()
    )]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    gw = Graph.from_edges(df, num_partitions=4)
    rw = spectral_clustering(gw, k=2, power_iterations=10, weight_col="w")
    assert rw.assignments.count() == 2 * n
