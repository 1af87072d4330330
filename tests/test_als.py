"""ALS matrix factorization vs an independent numpy oracle
(reference semantics: toolkits/collaborative_filtering/als.cpp)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from powergraph_spark.algorithms.als import (
    SAFE_NEG_OFFSET,
    als,
    predict,
    ratings_graph,
    recommend_topk,
    rmse,
)

K = 6
LAM = 0.05


def _fixture_ratings(n_users=30, n_items=20, seed=5):
    rng = np.random.RandomState(seed)
    rows = []
    for u in range(n_users):
        for i in rng.choice(n_items, size=rng.randint(2, 8),
                            replace=False):
            role = "validate" if rng.rand() < 0.15 else "train"
            rows.append((u, int(i), float(rng.randint(1, 6)), role))
    return rows


def _np_als(rows, init_u, init_i, k, lam, iters, regnormal=True):
    """Independent ALS: Jacobi within a side, alternating sides, the
    reference's normal equations with reg on the diagonal."""
    f_u = {u: np.array(v, dtype=np.float64) for u, v in init_u.items()}
    f_i = {i: np.array(v, dtype=np.float64) for i, v in init_i.items()}
    train = [(u, i, r) for u, i, r, role in rows if role == "train"]

    def solve_side(keyed, other):
        out = {}
        for key, obs in keyed.items():
            X = np.stack([other[o] for o, _ in obs])
            y = np.array([r for _, r in obs])
            reg = lam * len(obs) if regnormal else lam
            A = X.T @ X + reg * np.eye(k)
            out[key] = np.linalg.solve(A, X.T @ y)
        return out

    by_u, by_i = {}, {}
    for u, i, r in train:
        by_u.setdefault(u, []).append((i, r))
        by_i.setdefault(i, []).append((u, r))
    for _ in range(iters):
        f_u.update(solve_side({u: o for u, o in by_u.items()}, f_i))
        f_i.update(solve_side({i: o for i, o in by_i.items()}, f_u))
    return f_u, f_i


@pytest.fixture(scope="module")
def als_setup(spark):
    rows = _fixture_ratings()
    df = spark.createDataFrame(
        rows, "user long, item long, rating double, role string"
    )
    g = ratings_graph(df, num_partitions=4, role_col="role")
    return rows, df, g


def test_als_matches_numpy(spark, als_setup):
    rows, df, g = als_setup
    res = als(g, k=K, lam=LAM, regnormal=True, tolerance=1e-12,
              max_iterations=3)
    # feed the engine's own deterministic init to the oracle
    from powergraph_spark.algorithms.als import _hash_init_expr

    init = {
        r["id"]: r["f"]
        for r in g.vertices.selectExpr(
            "id", f"({_hash_init_expr(K)}) AS f"
        ).collect()
    }
    init_u = {i: v for i, v in init.items() if i >= 0}
    init_i = {-i - SAFE_NEG_OFFSET: v for i, v in init.items() if i < 0}
    exp_u, exp_i = _np_als(rows, init_u, init_i, K, LAM, iters=3)

    got_u = {r["id"]: np.array(r["factor"])
             for r in res.user_factors.collect()}
    got_i = {r["id"]: np.array(r["factor"])
             for r in res.item_factors.collect()}
    assert got_u.keys() >= exp_u.keys()
    for u, w in exp_u.items():
        assert np.allclose(got_u[u], w, atol=1e-8), u
    for i, w in exp_i.items():
        assert np.allclose(got_i[i], w, atol=1e-8), i


def test_als_rmse_decreases_and_aggregators(spark, als_setup):
    rows, df, g = als_setup
    short = als(g, k=K, lam=LAM, tolerance=1e-12, max_iterations=1)
    long = als(g, k=K, lam=LAM, tolerance=1e-12, max_iterations=5)
    train = df.filter("role = 'train'")
    r1 = rmse(short.user_factors, short.item_factors, train)
    r5 = rmse(long.user_factors, long.item_factors, train)
    assert r5 <= r1 + 1e-9, (r1, r5)
    assert r5 < 1.0  # 1..5 ratings, k=6 factors: fits well

    # error_aggregator analog: per-check (sse, n) in the metrics stream
    m = long.gas.metrics[-1].extras
    sse, n = m["train_sse"]
    assert n == train.count()
    assert abs((sse / n) ** 0.5 - r5) < 1e-6
    vn = df.filter("role = 'validate'").count()
    assert m["validate_sse"][1] == vn and vn > 0


def test_als_predict_clip_and_topk(spark, als_setup):
    rows, df, g = als_setup
    res = als(g, k=K, lam=LAM, tolerance=1e-12, max_iterations=3)
    pairs = df.select("user", "item").limit(20)
    p = predict(res.user_factors, res.item_factors, pairs,
                minval=1.0, maxval=5.0).collect()
    assert p and all(1.0 <= r["prediction"] <= 5.0 for r in p)

    top = recommend_topk(res.user_factors, res.item_factors, topk=3,
                         exclude=df.select("user", "item"))
    rows_top = top.collect()
    by_user = {}
    for r in rows_top:
        by_user.setdefault(r["user"], []).append(r)
    rated = {(u, i) for u, i, *_ in rows}
    for u, rs in by_user.items():
        assert [r["rank"] for r in sorted(rs, key=lambda r: r["rank"])] \
            == list(range(1, len(rs) + 1))
        assert all((u, r["item"]) not in rated for r in rs)
        scores = [r["score"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert scores == sorted(scores, reverse=True)


def _np_sgd(rows, init_u, init_i, k, gamma, lam, iters):
    """Batch-GD replica of the engine's determinized sgd.cpp rule:
    gradients from the CURRENT snapshot, both sides applied
    simultaneously."""
    f_u = {u: np.array(v, dtype=np.float64) for u, v in init_u.items()}
    f_i = {i: np.array(v, dtype=np.float64) for i, v in init_i.items()}
    train = [(u, i, r) for u, i, r, role in rows if role == "train"]
    for _ in range(iters):
        gu = {u: np.zeros(k) for u in f_u}
        gi = {i: np.zeros(k) for i in f_i}
        nu = {u: 0 for u in f_u}
        ni = {i: 0 for i in f_i}
        for u, i, r in train:
            e = r - float(f_u[u] @ f_i[i])
            gu[u] += e * f_i[i]
            nu[u] += 1
            gi[i] += e * f_u[u]
            ni[i] += 1
        f_u = {
            u: f_u[u] + gamma * (gu[u] - lam * nu[u] * f_u[u])
            if nu[u] else f_u[u]
            for u in f_u
        }
        f_i = {
            i: f_i[i] + gamma * (gi[i] - lam * ni[i] * f_i[i])
            if ni[i] else f_i[i]
            for i in f_i
        }
    return f_u, f_i


def test_sgd_matches_numpy(spark, als_setup):
    from powergraph_spark.algorithms import sgd
    from powergraph_spark.algorithms.als import _hash_init_expr

    rows, df, g = als_setup
    res = sgd(g, k=K, gamma=0.02, lam=0.05, tolerance=1e-15,
              max_iterations=4)
    init = {
        r["id"]: r["f"]
        for r in g.vertices.selectExpr(
            "id", f"({_hash_init_expr(K)}) AS f"
        ).collect()
    }
    init_u = {i: v for i, v in init.items() if i >= 0}
    init_i = {-i - SAFE_NEG_OFFSET: v for i, v in init.items() if i < 0}
    exp_u, exp_i = _np_sgd(rows, init_u, init_i, K, 0.02, 0.05, 4)

    got_u = {r["id"]: np.array(r["factor"])
             for r in res.user_factors.collect()}
    got_i = {r["id"]: np.array(r["factor"])
             for r in res.item_factors.collect()}
    for u, w in exp_u.items():
        assert np.allclose(got_u[u], w, atol=1e-9), u
    for i, w in exp_i.items():
        assert np.allclose(got_i[i], w, atol=1e-9), i

    # train RMSE decreases with more batch-GD steps
    longer = sgd(g, k=K, gamma=0.02, lam=0.05, tolerance=1e-15,
                 max_iterations=12)
    train = df.filter("role = 'train'")
    assert rmse(longer.user_factors, longer.item_factors, train) \
        < rmse(res.user_factors, res.item_factors, train)


def test_als_cross_arrow_batch_carry(spark, als_setup):
    """The segmented normal-equation kernel merges partial (XᵀX, Xᵀy)
    sums when one vertex's ratings straddle an Arrow batch boundary.
    Force 3-row batches (default 10k never splits the unit fixture) so
    the carry branch runs on nearly every vertex. The carry merge
    regroups a segment's partial sums ((batch₂ partial) + (batch₁
    carry) vs one sequential reduceat), so the contract is float-sum
    associativity noise, not bit identity — measured 1.4e-14 relative
    on this fixture; a logic bug (dropped/duplicated rows, wrong n)
    shows up orders of magnitude above 1e-12."""
    rows, df, g = als_setup
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    default = spark.conf.get(key)
    base = als(g, k=K, lam=LAM, tolerance=1e-12, max_iterations=2)
    fa = {r["id"]: np.array(r["factor"])
          for r in base.user_factors.collect()}
    try:
        spark.conf.set(key, "3")
        tiny = als(g, k=K, lam=LAM, tolerance=1e-12, max_iterations=2)
        fb = {r["id"]: np.array(r["factor"])
              for r in tiny.user_factors.collect()}
    finally:
        spark.conf.set(key, default)
    assert fa.keys() == fb.keys()
    for i in fa:
        assert np.allclose(fa[i], fb[i], rtol=1e-12, atol=1e-12), i


def test_als_parallelism_invariant(spark, als_setup):
    """Per-vertex normal-equation sums are segment-local (a vertex's
    ratings never split across partitions), so factors are identical
    at any partition count."""
    rows, df, g = als_setup
    g2 = ratings_graph(df, num_partitions=13, role_col="role")
    a = als(g, k=K, lam=LAM, tolerance=1e-12, max_iterations=2)
    b = als(g2, k=K, lam=LAM, tolerance=1e-12, max_iterations=2)
    fa = sorted((r["id"], tuple(r["factor"]))
                for r in a.user_factors.collect())
    fb = sorted((r["id"], tuple(r["factor"]))
                for r in b.user_factors.collect())
    assert fa == fb


def test_recommend_ann_full_probe_equals_exact(spark, als_setup):
    """recommend_topk_ann with nprobe == n_cells must reproduce the
    exact recommend_topk bit-for-bit (same score expression and
    tie-break) — this equality is what the driver oracle pins."""
    from powergraph_spark.algorithms.als import recommend_topk_ann

    rows, df, g = als_setup
    res = als(g, k=K, lam=LAM, tolerance=1e-12, max_iterations=2,
              with_rmse=False)
    exclude = df.select("user", "item")
    exact = recommend_topk(res.user_factors, res.item_factors, topk=3,
                           exclude=exclude)
    ann = recommend_topk_ann(res.user_factors, res.item_factors,
                             topk=3, n_cells=4, nprobe=4,
                             exclude=exclude)
    ex = sorted(map(tuple, exact.collect()))
    an = sorted(map(tuple, ann.collect()))
    assert ex == an


def test_recommend_ann_partial_probe_recall(spark, als_setup):
    """Partial probing returns a per-user top-k drawn from the probed
    cells only — rank-1 recall on the fixture should stay useful."""
    from powergraph_spark.algorithms.als import recommend_topk_ann

    rows, df, g = als_setup
    res = als(g, k=K, lam=LAM, tolerance=1e-12, max_iterations=2,
              with_rmse=False)
    exact = recommend_topk(res.user_factors, res.item_factors, topk=1)
    ann = recommend_topk_ann(res.user_factors, res.item_factors,
                             topk=1, n_cells=4, nprobe=2)
    ex = {r["user"]: r["item"] for r in exact.collect()}
    an = {r["user"]: r["item"] for r in ann.collect()}
    hits = sum(1 for u in ex if an.get(u) == ex[u])
    assert len(an) == len(ex)          # every user still gets results
    assert hits / len(ex) >= 0.5       # direction probing is useful
