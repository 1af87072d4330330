"""Truncated SVD vs numpy: an exact replica of the block iteration and
the ground-truth spectrum (reference: collaborative_filtering/svd.cpp)."""

from __future__ import annotations

import numpy as np

from powergraph_spark.algorithms import svd
from powergraph_spark.algorithms.als import (
    SAFE_NEG_OFFSET,
    _hash_init_expr,
    ratings_graph,
)

K = 3


def _fixture(spark, n_u=40, n_i=25, seed=9):
    """Low-rank-plus-noise matrix: well-separated top spectrum."""
    rng = np.random.RandomState(seed)
    A = np.zeros((n_u, n_i))
    for r, w in [(0, 20.0), (1, 8.0), (2, 3.0)]:
        A += w * np.outer(rng.randn(n_u), rng.randn(n_i))
    A += 0.05 * rng.randn(n_u, n_i)
    rows = [
        (u, i, float(A[u, i]), "train")
        for u in range(n_u) for i in range(n_i)
    ]
    df = spark.createDataFrame(
        rows, "user long, item long, rating double, role string"
    )
    return A, ratings_graph(df, num_partitions=4, role_col="role")


def _np_block_iteration(A, V0, iters):
    """Exact replica of the engine's alternating QR power iteration."""
    V = V0.copy()
    k = V.shape[1]
    for _ in range(iters):
        U = A @ V
        R = np.linalg.cholesky(U.T @ U + 1e-12 * np.eye(k)).T
        U = U @ np.linalg.inv(R)
        V = A.T @ U
        R = np.linalg.cholesky(V.T @ V + 1e-12 * np.eye(k)).T
        sigma = np.diag(R).copy()
        V = V @ np.linalg.inv(R)
    return U, V, sigma


def test_svd_matches_numpy_replica_and_spectrum(spark):
    A, g = _fixture(spark)
    res = svd(g, k=K, iterations=12)

    # engine's deterministic init, read back for the replica
    init = {
        r["id"]: r["f"]
        for r in g.vertices.filter("id < 0").selectExpr(
            "id", f"({_hash_init_expr(K)}) AS f"
        ).collect()
    }
    n_i = A.shape[1]
    V0 = np.zeros((n_i, K))
    for vid, vec in init.items():
        V0[-vid - SAFE_NEG_OFFSET] = vec

    exp_U, exp_V, exp_sigma = _np_block_iteration(A, V0, 12)

    got_sigma = np.array(res.singular_values)
    assert np.allclose(got_sigma, exp_sigma, atol=1e-8)

    got_U = np.zeros_like(exp_U)
    for r in res.user_vectors.collect():
        got_U[r["id"]] = r["arr"]
    got_V = np.zeros_like(exp_V)
    for r in res.item_vectors.collect():
        got_V[r["id"]] = r["arr"]
    assert np.allclose(got_U, exp_U, atol=1e-8)
    assert np.allclose(got_V, exp_V, atol=1e-8)

    # ground truth: converged to the true top-k spectrum, desc order
    true_sigma = np.linalg.svd(A, compute_uv=False)[:K]
    assert np.allclose(got_sigma, true_sigma, rtol=1e-4)
    assert list(got_sigma) == sorted(got_sigma, reverse=True)
    # singular-vector quality: A ~= U diag(sigma) V^T on the top-k
    approx = got_U @ np.diag(got_sigma) @ got_V.T
    rel = np.linalg.norm(A - approx) / np.linalg.norm(A)
    tail = np.linalg.norm(
        np.linalg.svd(A, compute_uv=False)[K:]
    ) / np.linalg.norm(A)
    assert rel < tail * 1.05 + 1e-6


def test_chol_r_rank_deficient_fallback():
    """ADVICE r4: a rank-deficient Gram with norm large enough that
    float error swamps the absolute 1e-12 ridge must degrade to the
    eigh path (RᵀR = PSD-projection of g, R invertible, σ = √w desc)
    instead of raising LinAlgError."""
    from powergraph_spark.algorithms.svd import _chol_r

    rng = np.random.RandomState(3)
    k = 4
    x = rng.randn(k, 2) * 1e6
    g = x @ x.T  # rank 2, entries ~1e12
    np.testing.assert_raises(
        np.linalg.LinAlgError,
        np.linalg.cholesky, g + 1e-12 * np.eye(k),
    )
    R, sigma = _chol_r(g, k)
    assert np.allclose(R.T @ R, g, rtol=1e-9, atol=1e-3)
    assert np.isfinite(np.linalg.inv(R)).all()
    assert sigma == sorted(sigma, reverse=True)
    true = np.sqrt(np.maximum(np.linalg.eigvalsh(g), 0))[::-1]
    assert np.allclose(sigma[:2], true[:2], rtol=1e-9)


def test_svd_rank_deficient_block_completes(spark):
    """End-to-end: k above the matrix rank with large ratings — the
    iteration must complete and still recover the true top singular
    value."""
    n_u, n_i = 12, 8
    u = np.arange(1, n_u + 1, dtype=float)
    v = np.arange(1, n_i + 1, dtype=float)
    A = 1e5 * np.outer(u, v)  # exactly rank 1, large norm
    rows = [
        (i, j, float(A[i, j]), "train")
        for i in range(n_u) for j in range(n_i)
    ]
    df = spark.createDataFrame(
        rows, "user long, item long, rating double, role string"
    )
    g = ratings_graph(df, num_partitions=2, role_col="role")
    res = svd(g, k=3, iterations=8)
    true_top = np.linalg.svd(A, compute_uv=False)[0]
    assert np.isfinite(res.singular_values).all()
    assert abs(res.singular_values[0] - true_top) / true_top < 1e-6
