"""Jacobi linear solver vs numpy replicas (reference semantics:
toolkits/linear_solvers/jacobi.cpp)."""

from __future__ import annotations

import numpy as np
import pytest

from powergraph_spark.algorithms.jacobi import jacobi


def _system(n=30, seed=7):
    """Strictly diagonally dominant sparse system (Jacobi converges)."""
    rng = np.random.RandomState(seed)
    A = np.zeros((n, n))
    for i in range(n):
        for j in rng.choice(n, size=4, replace=False):
            if i != j:
                A[i, j] = round(float(rng.uniform(-1, 1)), 3)
        A[i, i] = np.abs(A[i]).sum() + 1.0 + (i % 3)
    b = np.array([round(float(rng.uniform(-5, 5)), 3) for _ in range(n)])
    return A, b


def _entries_df(spark, A):
    rows = [
        (i, j, float(A[i, j]))
        for i in range(A.shape[0])
        for j in range(A.shape[1])
        if A[i, j] != 0.0
    ]
    return spark.createDataFrame(rows, "row long, col long, val double")


def _np_jacobi(A, b, iters):
    """Independent replica of the fixed-iteration driver loop
    (jacobi.cpp:322-326): x = (b - offdiag(A) x) / diag(A), x0 = 0."""
    d = np.diag(A).copy()
    off = A - np.diag(d)
    x = np.zeros_like(b)
    for _ in range(iters):
        x = (b - off @ x) / d
    return x


def test_jacobi_matches_numpy(spark):
    A, b = _system()
    bdf = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(b)], "id long, b double"
    )
    res = jacobi(_entries_df(spark, A), bdf, max_iterations=5,
                 num_partitions=4)
    want = _np_jacobi(A, b, 5)
    got = {r["id"]: r["x"] for r in res.x.collect()}
    np.testing.assert_allclose(
        np.array([got[i] for i in range(len(b))]), want,
        rtol=1e-10, atol=1e-12,
    )
    # residual norm reports ||Ax - b|| with the diagonal (jacobi.cpp:330)
    want_norm = float(np.linalg.norm(A @ want - b))
    assert abs(res.residual_norm - want_norm) < 1e-9


def test_jacobi_converges_to_solution(spark):
    A, b = _system()
    bdf = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(b)], "id long, b double"
    )
    res = jacobi(_entries_df(spark, A), bdf, max_iterations=60,
                 num_partitions=4)
    xstar = np.linalg.solve(A, b)
    got = {r["id"]: r["x"] for r in res.x.collect()}
    np.testing.assert_allclose(
        np.array([got[i] for i in range(len(b))]), xstar,
        rtol=1e-6, atol=1e-8,
    )
    assert res.residual_norm < 1e-5


def test_jacobi_default_diag_and_b(spark):
    """A vertex without an explicit diagonal defaults A_ii = 1
    (jacobi.cpp:60); a missing b component is 0."""
    ents = spark.createDataFrame(
        [(0, 0, 4.0), (0, 1, 1.0), (1, 0, 2.0)],
        "row long, col long, val double",
    )  # vertex 1 has no diagonal entry -> A_11 = 1
    bdf = spark.createDataFrame([(0, 8.0)], "id long, b double")
    res = jacobi(ents, bdf, max_iterations=3)
    A = np.array([[4.0, 1.0], [2.0, 1.0]])
    b = np.array([8.0, 0.0])
    want = _np_jacobi(A, b, 3)
    got = {r["id"]: r["x"] for r in res.x.collect()}
    np.testing.assert_allclose(
        np.array([got[0], got[1]]), want, rtol=1e-12
    )


def test_jacobi_zero_diag_raises(spark):
    ents = spark.createDataFrame(
        [(0, 0, 0.0), (0, 1, 1.0), (1, 1, 2.0)],
        "row long, col long, val double",
    )
    with pytest.raises(ValueError, match="zero diagonal"):
        jacobi(ents, None, max_iterations=1)
