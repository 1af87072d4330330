"""Sparse-ALS / CoSaMP vs an independent python replica (reference
semantics: toolkits/collaborative_filtering/sparse_als.cpp,
cosamp.hpp — including the fabs and position-indexing quirks)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from powergraph_spark.algorithms.als import als, ratings_graph
from powergraph_spark.algorithms.sparse_als import sparse_als

K = 5  # NLATENT for the fixture


def _ref_cosamp(Phi, u, Kk, max_iter=10, tol=1e-4):
    """Line-by-line cosamp.hpp:38-82 replica, written independently of
    the engine's implementation (itpp-style ops spelled out)."""
    D = len(u)
    Sest = [0.0] * D
    v = list(u)
    T2 = []
    t = 1
    while t < max_iter:
        corr = [abs(sum(Phi[r][c] * v[r] for r in range(D)))
                for c in range(D)]
        z = sorted(range(D), key=lambda c: (-corr[c], c))
        Omega = z[: 2 * Kk]
        T = sorted(set(Omega) | set(T2))
        phit = np.array([[Phi[r][c] for c in T] for r in range(D)])
        b = np.linalg.lstsq(phit, np.array(u), rcond=None)[0]
        b = [abs(x) for x in b]
        z3 = sorted(range(len(b)), key=lambda i: (-b[i], i))
        Sest = [0.0] * D
        for i in range(Kk):
            Sest[z3[i]] = b[z3[i]]  # cosamp.hpp:68-69 position quirk
        z2 = sorted(range(D), key=lambda i: (-abs(Sest[i]), i))
        T2 = z2[: Kk - 1]
        v = [u[r] - sum(Phi[r][c] * Sest[c] for c in range(D))
             for r in range(D)]
        if max(abs(x) for x in v) < tol:
            break
        t += 1
    return np.array(Sest)


def _fixture_ratings(n_users=20, n_items=12, seed=31):
    rng = np.random.RandomState(seed)
    rows = []
    for u in range(n_users):
        for i in rng.choice(n_items, size=rng.randint(3, 8),
                            replace=False):
            rows.append((u, int(i), float(rng.randint(1, 6)), "train"))
    return rows


def _np_sparse_als(rows, init, k, iters, lam, sparsity):
    """Half-iteration replica: users CoSaMP(XtX + lam I, Xy, K),
    items flat-lambda solve (sparse_als.cpp:329-343, mode=user)."""
    f = {vid: v.copy() for vid, v in init.items()}
    train = [(u, -(i + 2), r) for u, i, r, _ in rows]
    by_u, by_i = {}, {}
    for u, iv, r in train:
        by_u.setdefault(u, []).append((iv, r))
        by_i.setdefault(iv, []).append((u, r))
    Kk = int(math.ceil((1.0 - sparsity) * k))

    for _ in range(iters):
        new = {}
        for u, lst in by_u.items():
            A = lam * np.eye(k)
            b = np.zeros(k)
            for o, r in lst:
                A += np.outer(f[o], f[o])
                b += f[o] * r
            new[u] = _ref_cosamp(A.tolist(), b.tolist(), Kk)
        f.update(new)
        new = {}
        for iv, lst in by_i.items():
            A = lam * np.eye(k)
            b = np.zeros(k)
            for o, r in lst:
                A += np.outer(f[o], f[o])
                b += f[o] * r
            new[iv] = np.linalg.solve(A, b)
        f.update(new)
    return f


@pytest.fixture(scope="module")
def ratings_setup(spark):
    rows = _fixture_ratings()
    df = spark.createDataFrame(
        rows, "user long, item long, rating double, role string"
    )
    g = ratings_graph(df, num_partitions=4, role_col="role")
    return rows, df, g


def test_sparse_als_matches_replica(spark, ratings_setup):
    rows, df, g = ratings_setup
    from powergraph_spark.algorithms.als import _hash_init_expr

    res = sparse_als(g, k=K, lam=0.01, user_sparsity=0.8, mode="user",
                     tolerance=1e-15, max_iterations=2, with_rmse=False)
    init = {
        r["id"]: np.array(r["f"])
        for r in g.vertices.selectExpr(
            "id", f"({_hash_init_expr(K)}) AS f"
        ).collect()
    }
    oracle = _np_sparse_als(rows, init, K, iters=2, lam=0.01,
                            sparsity=0.8)
    for r in res.user_factors.collect():
        np.testing.assert_allclose(
            np.array(r["factor"]), oracle[r["id"]], rtol=1e-8,
            atol=1e-12,
        )
    for r in res.item_factors.collect():
        np.testing.assert_allclose(
            np.array(r["factor"]), oracle[-(r["id"] + 2)], rtol=1e-8,
            atol=1e-12,
        )


def test_sparse_side_is_sparse_and_nonnegative(spark, ratings_setup):
    """Structural reference quirks: the CoSaMP side keeps at most
    K = ceil((1-sparsity)*k) coefficients and they are magnitudes
    (cosamp.hpp:64 fabs)."""
    rows, df, g = ratings_setup
    res = sparse_als(g, k=K, user_sparsity=0.8, mode="user",
                     tolerance=1e-15, max_iterations=1, with_rmse=False)
    Kk = math.ceil(0.2 * K)
    for r in res.user_factors.collect():
        v = np.array(r["factor"])
        assert (v >= 0).all()
        assert np.count_nonzero(v) <= Kk
    # the flat-solve item side is NOT sparsified
    dense = sum(
        np.count_nonzero(np.array(r["factor"])) > Kk
        for r in res.item_factors.collect()
    )
    assert dense > 0


def test_sparse_als_mode_both_and_item(spark, ratings_setup):
    rows, df, g = ratings_setup
    Kk = math.ceil(0.2 * K)
    res = sparse_als(g, k=K, mode="both", tolerance=1e-15,
                     max_iterations=1, with_rmse=False)
    for r in res.item_factors.collect():
        assert np.count_nonzero(np.array(r["factor"])) <= Kk
    with pytest.raises(ValueError, match="unknown mode"):
        sparse_als(g, mode="nope")
