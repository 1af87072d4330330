"""NMF and SVD++ vs independent numpy oracles (reference semantics:
toolkits/collaborative_filtering/nmf.cpp, svdpp.cpp)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from powergraph_spark.algorithms.als import ratings_graph
from powergraph_spark.algorithms.nmf import EPSILON, nmf
from powergraph_spark.algorithms.svdpp import svdpp, svdpp_predict

K = 4


def _fixture_ratings(n_users=25, n_items=15, seed=11):
    rng = np.random.RandomState(seed)
    rows = []
    for u in range(n_users):
        for i in rng.choice(n_items, size=rng.randint(2, 7),
                            replace=False):
            role = "validate" if rng.rand() < 0.1 else "train"
            rows.append((u, int(i), float(rng.randint(1, 6)), role))
    return rows


@pytest.fixture(scope="module")
def ratings_setup(spark):
    rows = _fixture_ratings()
    df = spark.createDataFrame(
        rows, "user long, item long, rating double, role string"
    )
    g = ratings_graph(df, num_partitions=4, role_col="role")
    return rows, df, g


def _engine_init(g, expr_col):
    return {
        r["id"]: np.array(r["f"], dtype=np.float64)
        for r in g.vertices.selectExpr("id", f"({expr_col}) AS f").collect()
    }


# ------------------------------------------------------------------ NMF

def _np_nmf(rows, init, k, iters):
    """Independent multiplicative-update replica (nmf.cpp:209-241,
    :517-537): px = global other-side sum, per-vertex gather of
    other * (r / pred), clamp at epsilon."""
    f = {vid: v.copy() for vid, v in init.items()}
    train = [(u, -(i + 2), r) for u, i, r, role in rows if role == "train"]
    users = sorted({vid for vid in f if vid >= 0})
    items = sorted({vid for vid in f if vid < 0})
    by_u, by_i = {}, {}
    for u, iv, r in train:
        by_u.setdefault(u, []).append((iv, r))
        by_i.setdefault(iv, []).append((u, r))

    def half(update_ids, by, other_ids):
        px = np.sum([f[o] for o in other_ids], axis=0)
        new = {}
        for vid in update_ids:
            s = np.zeros(k)
            for o, r in by.get(vid, []):
                pred = float(f[vid] @ f[o])
                s += f[o] * (r / pred)
            if f[vid].sum() != 0:
                new[vid] = np.maximum(f[vid] * (s / px), EPSILON)
            else:
                new[vid] = f[vid]
        f.update(new)

    for _ in range(iters):
        half(users, by_u, items)
        half(items, by_i, users)
    return f


def test_nmf_matches_numpy(spark, ratings_setup):
    rows, df, g = ratings_setup
    from powergraph_spark.algorithms.nmf import _pos_hash_init_expr

    res = nmf(g, k=K, max_iterations=3, with_rmse=False)
    init = _engine_init(g, _pos_hash_init_expr(K))
    oracle = _np_nmf(rows, init, K, iters=3)

    got_u = {r["id"]: np.array(r["factor"])
             for r in res.user_factors.collect()}
    got_i = {r["id"]: np.array(r["factor"])
             for r in res.item_factors.collect()}
    for u, v in got_u.items():
        np.testing.assert_allclose(v, oracle[u], rtol=1e-8, atol=1e-12)
    for i, v in got_i.items():
        np.testing.assert_allclose(v, oracle[-(i + 2)], rtol=1e-8,
                                   atol=1e-12)
    # non-negativity is structural for NMF
    assert all((v >= 0).all() for v in got_u.values())
    assert all((v >= 0).all() for v in got_i.values())


def test_nmf_parallelism_invariance(spark, ratings_setup):
    rows, df, g = ratings_setup
    g2 = ratings_graph(df, num_partitions=7, role_col="role")
    a = nmf(g, k=2, max_iterations=2, with_rmse=False)
    b = nmf(g2, k=2, max_iterations=2, with_rmse=False)
    fa = sorted(
        (r["id"], tuple(round(x, 9) for x in r["factor"]))
        for r in a.user_factors.collect()
    )
    fb = sorted(
        (r["id"], tuple(round(x, 9) for x in r["factor"]))
        for r in b.user_factors.collect()
    )
    assert fa == fb


# ---------------------------------------------------------------- SVD++

def _np_svdpp(rows, init_p, init_y, k, iters, step=1e-4, reg=1e-4,
              step_dec=0.9):
    """Independent BSP SVD++ replica (svdpp.cpp:265-376 Jacobi form):
    PHASE1 w_u = sum_all_edges(y_j)/sqrt(deg_u); PHASE2 per-train-edge
    deltas summed per endpoint; step decay per iteration."""
    p = {vid: v.copy() for vid, v in init_p.items()}
    y = {vid: v.copy() for vid, v in init_y.items()}
    b = {vid: 0.0 for vid in init_p}
    w = {vid: np.zeros(k) for vid in init_p}
    alle = [(u, -(i + 2), r, role) for u, i, r, role in rows]
    train = [(u, iv, r) for u, iv, r, role in alle if role == "train"]
    gm = float(np.mean([r for _, _, r in train]))
    deg = {}
    for u, iv, r, role in alle:
        deg[u] = deg.get(u, 0) + 1

    for it in range(iters):
        d = step_dec ** it
        bs = fs = ws = step * d
        # PHASE1
        wsum = {u: np.zeros(k) for u in deg}
        for u, iv, r, role in alle:
            wsum[u] += y[iv]
        for u in deg:
            w[u] = wsum[u] / np.sqrt(deg[u])
        # PHASE2 (Jacobi)
        dp = {vid: np.zeros(k) for vid in p}
        dy = {vid: np.zeros(k) for vid in p}
        db = {vid: 0.0 for vid in p}
        for u, iv, r in train:
            pred = gm + b[u] + b[iv] + p[u] @ (p[iv] + y[iv])
            err = r - pred
            db[u] += bs * err
            db[iv] += bs * err
            dp[u] += fs * (err * (p[iv] - reg * p[u]))
            dp[iv] += fs * (err * (p[u] + w[u]) - reg * p[iv])
            dy[iv] += ws * (err * p[iv] / np.sqrt(deg[u]) - reg * y[iv])
        for vid in p:
            p[vid] = p[vid] + dp[vid]
            b[vid] = b[vid] + db[vid]
            if vid < 0:
                y[vid] = y[vid] + dy[vid]
    return p, y, b, gm


def test_svdpp_matches_numpy(spark, ratings_setup):
    rows, df, g = ratings_setup
    from powergraph_spark.algorithms.als import _hash_init_expr

    res = svdpp(g, k=K, max_iterations=3)
    init_p = _engine_init(g, _hash_init_expr(K))
    op, oy, ob, ogm = _np_svdpp(rows, init_p, init_p, K, iters=3)

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
        np.testing.assert_allclose(
            np.array(r["weight"]), oy[vid], rtol=1e-8, atol=1e-13
        )
        assert abs(r["bias"] - ob[vid]) < 1e-12


def test_svdpp_predict_rule(spark, ratings_setup):
    rows, df, g = ratings_setup
    res = svdpp(g, k=2, max_iterations=1)
    pairs = df.select("user", "item").limit(10)
    preds = svdpp_predict(res, pairs).collect()
    uf = {r["id"]: (np.array(r["factor"]), r["bias"])
          for r in res.user_factors.collect()}
    itf = {r["id"]: (np.array(r["factor"]), np.array(r["weight"]),
                     r["bias"])
           for r in res.item_factors.collect()}
    for r in preds:
        pu, bu = uf[r["user"]]
        qi, yi, bi = itf[r["item"]]
        want = res.global_mean + bu + bi + pu @ (qi + yi)
        assert abs(r["prediction"] - want) < 1e-10


def test_svdpp_rmse_improves(spark, ratings_setup):
    """Training with larger steps for a few iterations must reduce
    train RMSE vs the init model (sanity on gradient signs)."""
    rows, df, g = ratings_setup
    r0 = svdpp(g, k=K, max_iterations=0)
    r1 = svdpp(g, k=K, bias_step=1e-2, factor_step=1e-2,
               weight_step=1e-2, max_iterations=8)
    train = df.filter("role = 'train'")

    def train_rmse(res):
        p = svdpp_predict(res, train.select("user", "item"))
        j = train.join(p, ["user", "item"])
        row = j.agg(
            F.sqrt(F.avg((F.col("rating") - F.col("prediction")) ** 2))
            .alias("rmse")
        ).first()
        return float(row["rmse"])

    assert train_rmse(r1) < train_rmse(r0)
