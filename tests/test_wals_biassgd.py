"""WALS and bias-SGD vs independent numpy oracles (reference
semantics: toolkits/collaborative_filtering/wals.cpp, biassgd.cpp)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from powergraph_spark.algorithms.als import als, ratings_graph
from powergraph_spark.algorithms.biassgd import biassgd, biassgd_predict
from powergraph_spark.algorithms.wals import wals

K = 4


def _fixture_ratings(n_users=25, n_items=15, seed=23):
    rng = np.random.RandomState(seed)
    rows = []
    for u in range(n_users):
        for i in rng.choice(n_items, size=rng.randint(2, 7),
                            replace=False):
            role = "validate" if rng.rand() < 0.1 else "train"
            rows.append((
                u, int(i), float(rng.randint(1, 6)), role,
                float(1 + (i % 5)),
            ))
    return rows


@pytest.fixture(scope="module")
def ratings_setup(spark):
    rows = _fixture_ratings()
    df = spark.createDataFrame(
        rows,
        "user long, item long, rating double, role string, w double",
    )
    g = ratings_graph(df, num_partitions=4, role_col="role",
                      weight_col="w")
    return rows, df, g


def _engine_init(g, expr_col):
    return {
        r["id"]: np.array(r["f"], dtype=np.float64)
        for r in g.vertices.selectExpr("id", f"({expr_col}) AS f").collect()
    }


# ----------------------------------------------------------------- WALS

def _np_wals(rows, init, k, iters, lam):
    """Independent weighted-ALS replica (wals.cpp:224-231 gather,
    :320-337 apply): XtX = sum w f fT + flat lambda I, Xy = sum w f r,
    sequential user-then-item alternation."""
    f = {vid: v.copy() for vid, v in init.items()}
    train = [
        (u, -(i + 2), r, w) for u, i, r, role, w in rows
        if role == "train"
    ]
    by_u, by_i = {}, {}
    for u, iv, r, w in train:
        by_u.setdefault(u, []).append((iv, r, w))
        by_i.setdefault(iv, []).append((u, r, w))

    def half(by):
        new = {}
        for vid, lst in by.items():
            A = lam * np.eye(k)
            b = np.zeros(k)
            for o, r, w in lst:
                A += w * np.outer(f[o], f[o])
                b += w * f[o] * r
            new[vid] = np.linalg.solve(A, b)
        f.update(new)

    for _ in range(iters):
        half(by_u)
        half(by_i)
    return f


def test_wals_matches_numpy(spark, ratings_setup):
    rows, df, g = ratings_setup
    from powergraph_spark.algorithms.als import _hash_init_expr

    res = wals(g, k=K, lam=0.05, tolerance=1e-15, max_iterations=2,
               with_rmse=False)
    init = _engine_init(g, _hash_init_expr(K))
    oracle = _np_wals(rows, init, K, iters=2, lam=0.05)

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


def test_wals_weight_one_is_flat_lambda_als(spark, ratings_setup):
    """wals on an unweighted graph (default weight 1, wals.cpp:144)
    must equal als under the same flat regularization."""
    rows, df, g0 = ratings_setup
    g = ratings_graph(df, num_partitions=4, role_col="role")
    a = als(g, k=2, lam=0.05, regnormal=False, tolerance=1e-15,
            max_iterations=2, with_rmse=False)
    w = wals(g, k=2, lam=0.05, tolerance=1e-15, max_iterations=2,
             with_rmse=False)
    fa = sorted(
        (r["id"], tuple(round(x, 10) for x in r["factor"]))
        for r in a.user_factors.collect()
    )
    fw = sorted(
        (r["id"], tuple(round(x, 10) for x in r["factor"]))
        for r in w.user_factors.collect()
    )
    assert fa == fw


def test_wals_weights_change_solution(spark, ratings_setup):
    """Non-trivial weights must move the factors off the unweighted
    solution (guards against the weight column being dropped)."""
    rows, df, g = ratings_setup
    gu = ratings_graph(df, num_partitions=4, role_col="role")
    w = wals(g, k=2, lam=0.05, tolerance=1e-15, max_iterations=1,
             with_rmse=False)
    u = wals(gu, k=2, lam=0.05, tolerance=1e-15, max_iterations=1,
             with_rmse=False)
    fw = {r["id"]: np.array(r["factor"])
          for r in w.user_factors.collect()}
    fu = {r["id"]: np.array(r["factor"])
          for r in u.user_factors.collect()}
    assert any(
        not np.allclose(fw[i], fu[i], rtol=1e-6) for i in fw
    )


# ------------------------------------------------------------- bias-SGD

def _np_biassgd(rows, init, k, iters, gamma, lam, step_dec):
    """Independent BSP bias-SGD replica (biassgd.cpp:225-263 rule,
    Jacobi-summed per superstep, gamma decayed per pass :367)."""
    p = {vid: v.copy() for vid, v in init.items()}
    b = {vid: 0.0 for vid in init}
    train = [
        (u, -(i + 2), r) for u, i, r, role, w in rows if role == "train"
    ]
    gm = float(np.mean([r for _, _, r in train]))
    for it in range(iters):
        g = gamma * step_dec ** it
        dp = {vid: np.zeros(k) for vid in p}
        db = {vid: 0.0 for vid in p}
        n = {vid: 0 for vid in p}
        for u, iv, r in train:
            err = r - (gm + b[u] + b[iv] + p[u] @ p[iv])
            dp[u] += err * p[iv]
            dp[iv] += err * p[u]
            db[u] += err
            db[iv] += err
            n[u] += 1
            n[iv] += 1
        for vid in p:
            if n[vid]:
                p[vid] = p[vid] + g * (dp[vid] - lam * n[vid] * p[vid])
                b[vid] = b[vid] + g * (db[vid] - lam * n[vid] * b[vid])
    return p, b, gm


def test_biassgd_matches_numpy(spark, ratings_setup):
    rows, df, g = ratings_setup
    from powergraph_spark.algorithms.als import _hash_init_expr

    res = biassgd(g, k=K, gamma=0.005, lam=0.01, step_dec=0.9,
                  tolerance=1e-15, max_iterations=3, with_rmse=False)
    init = _engine_init(g, _hash_init_expr(K))
    op, ob, ogm = _np_biassgd(rows, init, K, iters=3, gamma=0.005,
                              lam=0.01, step_dec=0.9)

    assert abs(res.global_mean - ogm) < 1e-12
    for r in res.user_factors.collect():
        np.testing.assert_allclose(
            np.array(r["factor"]), op[r["id"]], rtol=1e-8, atol=1e-13
        )
        assert abs(r["bias"] - ob[r["id"]]) < 1e-12
    for r in res.item_factors.collect():
        vid = -(r["id"] + 2)
        np.testing.assert_allclose(
            np.array(r["factor"]), op[vid], rtol=1e-8, atol=1e-13
        )
        assert abs(r["bias"] - ob[vid]) < 1e-12


def test_biassgd_predict_rule(spark, ratings_setup):
    rows, df, g = ratings_setup
    res = biassgd(g, k=2, tolerance=1e-15, max_iterations=1,
                  with_rmse=False)
    pairs = df.select("user", "item").limit(10)
    preds = biassgd_predict(res, pairs).collect()
    uf = {r["id"]: (np.array(r["factor"]), r["bias"])
          for r in res.user_factors.collect()}
    itf = {r["id"]: (np.array(r["factor"]), r["bias"])
           for r in res.item_factors.collect()}
    for r in preds:
        pu, bu = uf[r["user"]]
        qi, bi = itf[r["item"]]
        want = res.global_mean + bu + bi + pu @ qi
        assert abs(r["prediction"] - want) < 1e-10


def test_biassgd_rmse_improves(spark, ratings_setup):
    """A few iterations with larger steps must reduce train RMSE vs
    the init model (sanity on gradient signs)."""
    rows, df, g = ratings_setup
    r0 = biassgd(g, k=K, max_iterations=0, with_rmse=False)
    r1 = biassgd(g, k=K, gamma=0.01, lam=0.01, tolerance=1e-15,
                 max_iterations=8, with_rmse=False)
    train = df.filter("role = 'train'")

    def train_rmse(res):
        p = biassgd_predict(res, train.select("user", "item"))
        j = train.join(p, ["user", "item"])
        row = j.agg(
            F.sqrt(F.avg((F.col("rating") - F.col("prediction")) ** 2))
            .alias("rmse")
        ).first()
        return float(row["rmse"])

    assert train_rmse(r1) < train_rmse(r0)
