"""AdPredictor vs an independent numpy replica (reference semantics:
toolkits/collaborative_filtering/adpredictor.cpp, cdf.hpp)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from powergraph_spark.algorithms.adpredictor import (
    PHI_A1, PHI_A2, PHI_A3, PHI_A4, PHI_A5, PHI_P, REF_PI,
    adpredictor, adpredictor_graph,
)


def _phi(x):
    """cdf.hpp:35-48 replica (A&S 7.1.26)."""
    sign = -1.0 if x < 0 else 1.0
    z = abs(x) / math.sqrt(2.0)
    t = 1.0 / (1.0 + PHI_P * z)
    y = 1.0 - (((((PHI_A5 * t + PHI_A4) * t) + PHI_A3) * t + PHI_A2)
               * t + PHI_A1) * t * math.exp(-z * z)
    return 0.5 * (1.0 + sign * y)


def _v(t):
    p = _phi(t)
    if p == 0.0:
        p = 1e-5
    gn = 1.0 / math.sqrt(2.0 * REF_PI)
    return gn * math.exp(-t * t / 2.0) / p


def _w(t):
    vt = _v(t)
    return vt * (vt + t)


def _fixture(n_samples=40, n_features=12, seed=5):
    rng = np.random.RandomState(seed)
    rows = []
    for s in range(n_samples):
        y = 1 if rng.rand() < 0.5 else -1
        for f in rng.choice(n_features, size=rng.randint(2, 5),
                            replace=False):
            rows.append((s, int(f), y))
    return rows


def _np_adpredictor(rows, iters):
    """Independent replica of the two-phase loop
    (adpredictor.cpp:200-254, :449-460): per-sample (M, S) sums, then
    per-feature posterior with mu factored as mu + sigma*sum(y v /
    sqrt(S)) and sigma via exp(sum(ln(1 - sigma w / S))) — the
    engine's exact op order."""
    feats = sorted({f for _, f, _ in rows})
    samples = sorted({s for s, _, _ in rows})
    by_s = {}
    by_f = {}
    for s, f, y in rows:
        by_s.setdefault(s, []).append(f)
        by_f.setdefault(f, []).append(s)
    ylab = {s: y for s, _, y in rows}
    mu = {f: 0.0 for f in feats}
    sg = {f: 1.0 for f in feats}
    M = {}
    S = {}
    for _ in range(iters):
        for s in samples:
            M[s] = sum(mu[f] for f in by_s[s])
            S[s] = sum(sg[f] for f in by_s[s])
        nmu, nsg = {}, {}
        for f in feats:
            mu_sum = 0.0
            ln_sum = 0.0
            for s in by_f[f]:
                t = ylab[s] * M[s] / math.sqrt(S[s])
                mu_sum += ylab[s] / math.sqrt(S[s]) * _v(t)
                ln_sum += math.log(1.0 - sg[f] / S[s] * _w(t))
            nmu[f] = mu[f] + sg[f] * mu_sum
            nsg[f] = sg[f] * math.exp(ln_sum)
        mu, sg = nmu, nsg
    score = {s: sum(mu[f] for f in by_s[s]) for s in samples}
    return mu, sg, score


@pytest.fixture(scope="module")
def adp_setup(spark):
    rows = _fixture()
    df = spark.createDataFrame(rows, "sample long, feature long, y int")
    g = adpredictor_graph(df, num_partitions=4)
    return rows, g


def test_adpredictor_matches_numpy(spark, adp_setup):
    rows, g = adp_setup
    res = adpredictor(g, max_iterations=3)
    omu, osg, oscore = _np_adpredictor(rows, iters=3)
    for r in res.feature_weights.collect():
        np.testing.assert_allclose(r["mu"], omu[r["id"]], rtol=1e-8)
        np.testing.assert_allclose(r["sigma"], osg[r["id"]], rtol=1e-8)
        assert r["sigma"] > 0
    for r in res.sample_scores.collect():
        np.testing.assert_allclose(
            r["score"], oscore[r["id"]], rtol=1e-8
        )
        # prob = phi(score * y / beta), adpredictor.cpp:176-189
        np.testing.assert_allclose(
            r["prob"], _phi(oscore[r["id"]] * r["y"]), rtol=1e-8
        )


def test_adpredictor_separable_labels_learn(spark):
    """On linearly separable data (disjoint feature sets per class)
    the model must score positives above negatives after training."""
    rows = []
    for s in range(20):
        y = 1 if s % 2 == 0 else -1
        base = 0 if y == 1 else 5
        for f in range(base, base + 3):
            rows.append((s, f, y))
    df = spark.createDataFrame(rows, "sample long, feature long, y int")
    g = adpredictor_graph(df, num_partitions=2)
    res = adpredictor(g, max_iterations=4)
    scores = {r["id"]: r["score"] for r in res.sample_scores.collect()}
    pos = [scores[s] for s in range(0, 20, 2)]
    neg = [scores[s] for s in range(1, 20, 2)]
    assert min(pos) > max(neg)
    # posterior variances shrink from the prior
    for r in res.feature_weights.collect():
        assert 0 < r["sigma"] < 1


def test_adpredictor_parallelism_invariance(spark, adp_setup):
    rows, g = adp_setup
    df = g.edges.sparkSession.createDataFrame(
        rows, "sample long, feature long, y int"
    )
    g2 = adpredictor_graph(df, num_partitions=7)
    a = adpredictor(g, max_iterations=2)
    b = adpredictor(g2, max_iterations=2)
    fa = sorted(
        (r["id"], round(r["mu"], 9), round(r["sigma"], 9))
        for r in a.feature_weights.collect()
    )
    fb = sorted(
        (r["id"], round(r["mu"], 9), round(r["sigma"], 9))
        for r in b.feature_weights.collect()
    )
    assert fa == fb
