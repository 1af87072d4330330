"""AD3/ADMM dual decomposition: the active-set QP against exhaustive
KKT optimality, and the distributed program against a python replica
plus brute-force MAP (reference semantics: dd_grlab.hpp:871-1180 +
ad3_qp.hpp)."""

from __future__ import annotations

import numpy as np

from powergraph_spark.algorithms.admm import dd_map_admm, solve_qp_dense
from powergraph_spark.graph import Graph

from test_dd import _brute_map, _loopy, _potts


# ------------------------------------------------------------ QP kernel

def _qp_objective(alp, vlp, pf, C):
    """f(p) = alp.p + vlp.(Mp) - 1/2||Mp||^2 for a dense config
    posterior pf."""
    q = np.zeros(2 * C)
    for c, w in enumerate(pf):
        q[c // C] += w
        q[C + c % C] += w
    return float(np.dot(alp, pf) + np.dot(vlp, q) - 0.5 * np.dot(q, q))


def _kkt_check(alp, vlp, q, pf, C, tol=1e-6):
    """Exact optimality for the concave QP over the simplex: there
    must exist tau with score(c) = alp[c] + (vlp - q).m_c <= tau for
    all configs, equality on the support of pf."""
    scores = np.array([
        alp[c] + (vlp[c // C] - q[c // C])
        + (vlp[C + c % C] - q[C + c % C])
        for c in range(C * C)
    ])
    support = pf > 1e-9
    assert support.any()
    tau = scores[support].max()
    assert np.allclose(scores[support], tau, atol=tol), (scores, pf)
    assert (scores <= tau + tol).all(), (scores, tau, pf)


def test_qp_kkt_random_instances():
    rng = np.random.RandomState(7)
    for C in (2, 3):
        for _ in range(40):
            alp = rng.randn(C * C)
            vlp = rng.randn(2 * C)
            q, pf, *_ = solve_qp_dense(alp, vlp, C, [], [],
                                       np.empty(0))
            assert abs(pf.sum() - 1.0) < 1e-9
            assert (pf >= -1e-9).all()
            np.testing.assert_allclose(
                q[:C].sum(), 1.0, atol=1e-9)
            np.testing.assert_allclose(
                q[C:].sum(), 1.0, atol=1e-9)
            _kkt_check(alp, vlp, q, pf, C)


def test_qp_beats_random_simplex_points():
    rng = np.random.RandomState(13)
    C = 3
    for _ in range(10):
        alp = rng.randn(C * C)
        vlp = rng.randn(2 * C)
        _, pf, *_ = solve_qp_dense(alp, vlp, C, [], [], np.empty(0))
        best = _qp_objective(alp, vlp, pf, C)
        for _ in range(200):
            other = rng.dirichlet(np.ones(C * C))
            assert best >= _qp_objective(alp, vlp, other, C) - 1e-8


def test_qp_warm_start_consistent():
    """Re-solving a perturbed instance from the previous caches gives
    the same solution as a cold solve (the reference persists the
    active set across ADMM rounds)."""
    rng = np.random.RandomState(3)
    C = 2
    alp = rng.randn(C * C)
    vlp = rng.randn(2 * C)
    q1, pf1, aset, dist, inv_a = solve_qp_dense(
        alp, vlp, C, [], [], np.empty(0))
    vlp2 = vlp + 0.05 * rng.randn(2 * C)
    q_warm, pf_warm, *_ = solve_qp_dense(
        alp, vlp2, C, list(aset), list(dist), np.asarray(inv_a))
    q_cold, pf_cold, *_ = solve_qp_dense(
        alp, vlp2, C, [], [], np.empty(0))
    np.testing.assert_allclose(q_warm, q_cold, atol=1e-7)
    np.testing.assert_allclose(pf_warm, pf_cold, atol=1e-7)
    _kkt_check(alp, vlp2, q_warm, pf_warm, C)


def test_qp_integral_when_lp_tight():
    """With a dominant configuration the QP solution is that one-hot
    vertex (the LP init already solves it)."""
    C = 2
    alp = np.array([5.0, 0.0, 0.0, 0.0])
    vlp = np.zeros(2 * C)
    q, pf, *_ = solve_qp_dense(alp, vlp, C, [], [], np.empty(0))
    np.testing.assert_allclose(pf, [1.0, 0.0, 0.0, 0.0], atol=1e-9)
    np.testing.assert_allclose(q, [1.0, 0.0, 1.0, 0.0], atol=1e-9)


# --------------------------------------------------------- the program

def _np_admm(edges, pots, k, iters, step=1.0, fac=None):
    """Replica of the engine superstep AROUND the (KKT-verified) QP
    kernel: eps = pot/deg, even phase = SolveMAP dual + QP per factor,
    odd phase = p = (sum q)/deg, lambda += step*(p - q); dual/
    certificate at the incoming multipliers, decode at the checked
    iterate. Stops when the decoded config attains every factor max
    (the engine's depletion ballot)."""
    fac = fac or {e: _potts(2.0 * w, k) for e, w in edges.items()}
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    eps = {v: pots[v] / deg[v] for v in deg}
    lam = {e: (np.zeros(k), np.zeros(k)) for e in edges}
    qs = {e: (np.full(k, 1.0 / (2 * k)), np.full(k, 1.0 / (2 * k)))
          for e in edges}
    p = {v: np.full(k, 0.5) for v in deg}
    caches = {e: ([], [], np.empty(0)) for e in edges}
    duals, primals = [], []
    for _ in range(iters):
        # even: dual at incoming lambda + QP
        fmax, dual = {}, 0.0
        for (a, b), (ls, ld) in lam.items():
            alp = fac[(a, b)].reshape(-1)
            le = np.concatenate([ls + eps[a], ld + eps[b]])
            scores = np.array([
                alp[c] + le[c // k] + le[k + c % k]
                for c in range(k * k)
            ])
            fmax[(a, b)] = scores
            dual += scores.max()
            vlp = np.concatenate([p[a], p[b]]) + le
            q, pf, aset, dist, inv_a = solve_qp_dense(
                alp, vlp, k, *caches[(a, b)])
            caches[(a, b)] = (list(aset), list(dist),
                              np.asarray(inv_a))
            qs[(a, b)] = (q[:k].copy(), q[k:].copy())
        # odd: averaging + multiplier update
        pn = {v: np.zeros(k) for v in deg}
        for (a, b), (qa, qb) in qs.items():
            pn[a] += qa
            pn[b] += qb
        pn = {v: pn[v] / deg[v] for v in deg}
        xs = {v: int(np.argmax(pn[v])) for v in deg}
        primal = sum(pots[v][xs[v]] for v in deg)
        agree = True
        for (a, b), (qa, qb) in qs.items():
            primal += fac[(a, b)][xs[a], xs[b]]
            sc = fmax[(a, b)]
            agree = agree and (
                sc[xs[a] * k + xs[b]] >= sc.max())
            ls, ld = lam[(a, b)]
            lam[(a, b)] = (ls + step * (pn[a] - qa),
                           ld + step * (pn[b] - qb))
        p = pn
        duals.append(dual)
        primals.append(primal)
        if agree:
            break
    labels = {v: int(np.argmax(p[v])) if v in deg
              else int(np.argmax(pots[v])) for v in pots}
    return lam, p, labels, duals, primals


def _run(spark, edges, pots, k, P=4, **kw):
    edf = spark.createDataFrame(
        [(a, b, float(w)) for (a, b), w in edges.items()],
        "src long, dst long, w double",
    )
    g = Graph.from_edges(edf.select("src", "dst", "w"), num_partitions=P)
    pdf = spark.createDataFrame(
        [(v, [float(x) for x in p]) for v, p in pots.items()],
        "id long, potential array<double>",
    )
    return dd_map_admm(g, pdf, num_states=k, weight_col="w", **kw)


def test_admm_matches_python_replica(spark):
    """Fixed 4 pairs must replay the replica: multipliers, beliefs,
    decoded labels, and the dual/primal metrics stream. (The QP kernel
    itself is KKT-verified above; this pins the distributed plumbing —
    aggregation, eps split, update order, metric conventions.)"""
    edges, pots = _loopy()
    res = _run(spark, edges, pots, k=3, max_iterations=4)
    lam, p, labels, duals, primals = _np_admm(edges, pots, 3, iters=4)
    got = {(r["src"], r["dst"]): (np.array(r["lam_s"]),
                                  np.array(r["lam_d"]))
           for r in res.multipliers.collect()}
    for e, (ls, ld) in lam.items():
        np.testing.assert_allclose(got[e][0], ls, atol=1e-9)
        np.testing.assert_allclose(got[e][1], ld, atol=1e-9)
    assert {r["id"]: r["label"]
            for r in res.assignments.collect()} == labels
    bel = {r["id"]: np.array(r["belief"])
           for r in res.assignments.collect()}
    for v in p:
        np.testing.assert_allclose(bel[v], p[v], atol=1e-9)
    md = [m.extras["dual"] for m in res.gas.metrics]
    mp = [m.extras["primal"] for m in res.gas.metrics]
    np.testing.assert_allclose(md, duals, atol=1e-9)
    np.testing.assert_allclose(mp, primals, atol=1e-9)


def test_admm_certifies_exact_map(spark):
    edges = {(0, 1): 1.0, (1, 2): 1.0, (2, 3): 1.0, (3, 0): 1.0,
             (1, 4): 0.5}
    pots = {0: np.array([1.2, -0.3]), 1: np.array([0.8, -0.1]),
            2: np.array([-0.4, 0.2]), 3: np.array([0.9, -0.6]),
            4: np.array([-0.2, 0.1])}
    res = _run(spark, edges, pots, k=2, max_iterations=100)
    want_score, want_x = _brute_map(edges, pots, 2)
    assert res.agreement
    assert res.gas.termination == "TASK_DEPLETION"
    assert {r["id"]: r["label"]
            for r in res.assignments.collect()} == want_x
    np.testing.assert_allclose(res.dual, want_score, atol=1e-9)
    np.testing.assert_allclose(res.primal, want_score, atol=1e-9)


def test_admm_exact_on_tree_with_integral_beliefs(spark):
    """AD3 on a tree converges to the exact MAP with (near-)integral
    beliefs (the LP relaxation is tight)."""
    edges = {(0, 1): 1.0, (1, 2): 0.7, (2, 3): 1.3}
    rng = np.random.RandomState(11)
    pots = {v: np.log(rng.dirichlet(np.ones(3)) + 0.05) for v in range(4)}
    res = _run(spark, edges, pots, k=3, max_iterations=200)
    want_score, want_x = _brute_map(edges, pots, 3)
    assert res.agreement
    assert {r["id"]: r["label"]
            for r in res.assignments.collect()} == want_x
    np.testing.assert_allclose(res.dual, want_score, atol=1e-9)


def test_admm_weak_duality(spark):
    """At every check: dual >= MAP >= decoded primal. (No ordering is
    asserted for the mid-run relaxed primal: before the ADMM
    residuals vanish the fractional point (p, p_f) is not
    marginal-consistent, so it is not LP-feasible and can score
    above or below the decode.)"""
    edges, pots = _loopy()
    res = _run(spark, edges, pots, k=3, max_iterations=10)
    want_score, _ = _brute_map(edges, pots, 3)
    for m in res.gas.metrics:
        assert m.extras["dual"] >= want_score - 1e-9
        assert m.extras["primal"] <= want_score + 1e-9
        assert np.isfinite(m.extras["primal_rel"])
    assert res.primal_best == max(
        m.extras["primal"] for m in res.gas.metrics)


def test_admm_residuals_shrink(spark):
    """ADMM primal/dual residuals decrease over the run on the loopy
    instance (monitored via the metrics aggregators)."""
    edges, pots = _loopy()
    res = _run(spark, edges, pots, k=3, max_iterations=12)
    pres = [m.extras["primal_res"] for m in res.gas.metrics]
    dres = [m.extras["dual_res"] for m in res.gas.metrics]
    # compare the first real reading (superstep 2 — superstep 1 sees
    # the synthetic init posteriors) against the last
    assert pres[-1] <= pres[1] + 1e-12
    assert dres[-1] <= dres[1] + 1e-12


def test_admm_parallelism_invariance(spark):
    edges, pots = _loopy()
    a = _run(spark, edges, pots, k=3, P=2, max_iterations=5)
    b = _run(spark, edges, pots, k=3, P=7, max_iterations=5)
    la = sorted(
        (r["src"], r["dst"],
         tuple(round(x, 12) for x in r["lam_s"]),
         tuple(round(x, 12) for x in r["lam_d"]))
        for r in a.multipliers.collect()
    )
    lb = sorted(
        (r["src"], r["dst"],
         tuple(round(x, 12) for x in r["lam_s"]),
         tuple(round(x, 12) for x in r["lam_d"]))
        for r in b.multipliers.collect()
    )
    assert la == lb


def test_admm_isolated_vertex_keeps_prior_argmax(spark):
    edges = {(0, 1): 1.0}
    pots = {0: np.array([0.1, -0.2]), 1: np.array([0.0, 0.0]),
            7: np.array([-1.0, -0.5])}
    res = _run(spark, edges, pots, k=2, max_iterations=3)
    got = {r["id"]: r["label"] for r in res.assignments.collect()}
    assert got[7] == 1


# ------------------------------------------------------------ Bethe-ADMM

def _np_bethe(edges, pots, k, iters, step=1.0, alpha=1.0, fac=None):
    """Independent replica of the Bethe-ADMM superstep: eta potentials
    exponentiated base 10 and scaled 1/alpha with the Bethe-entropy
    gradient folded in (10*q for the unaries, fb/(10*q_s*q_d) for the
    factor), one exact sum-product pass per factor, per-block
    normalization, 1e-99 clamp; then the shared ADMM odd phase. Stops
    at the certificate like the engine."""
    fac = fac or {e: _potts(2.0 * w, k) for e, w in edges.items()}
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    eps = {v: pots[v] / deg[v] for v in deg}
    lam = {e: (np.zeros(k), np.zeros(k)) for e in edges}
    qs = {e: (np.full(k, 1.0 / (2 * k)), np.full(k, 1.0 / (2 * k)))
          for e in edges}
    p = {v: np.full(k, 0.5) for v in deg}
    fbs = {e: np.full(k * k, 1.0 / (k * k)) for e in edges}
    duals, primals = [], []
    for _ in range(iters):
        fmax, dual = {}, 0.0
        for (a, b), (ls, ld) in lam.items():
            alp = fac[(a, b)].reshape(-1)
            le_s, le_d = ls + eps[a], ld + eps[b]
            scores = np.array([
                alp[c] + le_s[c // k] + le_d[c % k]
                for c in range(k * k)
            ])
            fmax[(a, b)] = scores
            dual += scores.max()
            qa, qb = qs[(a, b)]
            us = 10.0 ** ((le_s + step * (p[a] - qa)) / alpha) \
                * (10.0 * qa)
            ud = 10.0 ** ((le_d + step * (p[b] - qb)) / alpha) \
                * (10.0 * qb)
            fe = np.array([
                10.0 ** (alp[c] / alpha) * (fbs[(a, b)][c] / 10.0)
                / qa[c // k] / qb[c % k]
                for c in range(k * k)
            ])
            rqs = np.array([
                us[i] * sum(fe[i * k + j] * ud[j] for j in range(k))
                for i in range(k)
            ])
            rqd = np.array([
                ud[j] * sum(fe[i * k + j] * us[i] for i in range(k))
                for j in range(k)
            ])
            rfb = np.array([fe[c] * us[c // k] * ud[c % k]
                            for c in range(k * k)])
            qs[(a, b)] = (np.maximum(rqs / rqs.sum(), 1e-99),
                          np.maximum(rqd / rqd.sum(), 1e-99))
            fbs[(a, b)] = np.maximum(rfb / rfb.sum(), 1e-99)
        pn = {v: np.zeros(k) for v in deg}
        for (a, b), (qa, qb) in qs.items():
            pn[a] += qa
            pn[b] += qb
        pn = {v: pn[v] / deg[v] for v in deg}
        xs = {v: int(np.argmax(pn[v])) for v in deg}
        primal = sum(pots[v][xs[v]] for v in deg)
        agree = True
        for (a, b), (qa, qb) in qs.items():
            primal += fac[(a, b)][xs[a], xs[b]]
            sc = fmax[(a, b)]
            agree = agree and sc[xs[a] * k + xs[b]] >= sc.max()
            ls, ld = lam[(a, b)]
            lam[(a, b)] = (ls + step * (pn[a] - qa),
                           ld + step * (pn[b] - qb))
        p = pn
        duals.append(dual)
        primals.append(primal)
        if agree:
            break
    labels = {v: int(np.argmax(p[v])) if v in deg
              else int(np.argmax(pots[v])) for v in pots}
    return lam, p, labels, duals, primals


def _run_bethe(spark, edges, pots, k, P=4, **kw):
    from powergraph_spark.algorithms.admm import dd_map_bethe

    edf = spark.createDataFrame(
        [(a, b, float(w)) for (a, b), w in edges.items()],
        "src long, dst long, w double",
    )
    g = Graph.from_edges(edf.select("src", "dst", "w"), num_partitions=P)
    pdf = spark.createDataFrame(
        [(v, [float(x) for x in p]) for v, p in pots.items()],
        "id long, potential array<double>",
    )
    return dd_map_bethe(g, pdf, num_states=k, weight_col="w", **kw)


def test_bethe_matches_numpy_replica(spark):
    """Fixed 4 pairs replay the independent replica (1e-9: JVM
    Math.pow and numpy ** may differ in the last ulp): multipliers,
    beliefs, labels, metric streams."""
    edges, pots = _loopy()
    res = _run_bethe(spark, edges, pots, k=3, max_iterations=4)
    lam, p, labels, duals, primals = _np_bethe(edges, pots, 3, iters=4)
    got = {(r["src"], r["dst"]): (np.array(r["lam_s"]),
                                  np.array(r["lam_d"]))
           for r in res.multipliers.collect()}
    for e, (ls, ld) in lam.items():
        np.testing.assert_allclose(got[e][0], ls, atol=1e-9)
        np.testing.assert_allclose(got[e][1], ld, atol=1e-9)
    assert {r["id"]: r["label"]
            for r in res.assignments.collect()} == labels
    bel = {r["id"]: np.array(r["belief"])
           for r in res.assignments.collect()}
    for v in p:
        np.testing.assert_allclose(bel[v], p[v], atol=1e-9)
    md = [m.extras["dual"] for m in res.gas.metrics]
    mp = [m.extras["primal"] for m in res.gas.metrics]
    np.testing.assert_allclose(md, duals, atol=1e-9)
    np.testing.assert_allclose(mp, primals, atol=1e-9)


def test_bethe_recovers_map_on_strong_instance(spark):
    edges = {(0, 1): 1.0, (1, 2): 1.0, (2, 3): 1.0, (3, 0): 1.0,
             (1, 4): 0.5}
    pots = {0: np.array([1.2, -0.3]), 1: np.array([0.8, -0.1]),
            2: np.array([-0.4, 0.2]), 3: np.array([0.9, -0.6]),
            4: np.array([-0.2, 0.1])}
    res = _run_bethe(spark, edges, pots, k=2, max_iterations=100)
    want_score, want_x = _brute_map(edges, pots, 2)
    assert {r["id"]: r["label"]
            for r in res.assignments.collect()} == want_x
    # weak duality holds at every check regardless of the schedule
    for m in res.gas.metrics:
        assert m.extras["dual"] >= want_score - 1e-9
        assert m.extras["primal"] <= want_score + 1e-9
    if res.agreement:  # certificate, when reached, is exact
        np.testing.assert_allclose(res.dual, want_score, atol=1e-9)
        np.testing.assert_allclose(res.primal, want_score, atol=1e-9)


def test_bethe_parallelism_invariance(spark):
    edges, pots = _loopy()
    a = _run_bethe(spark, edges, pots, k=3, P=2, max_iterations=4)
    b = _run_bethe(spark, edges, pots, k=3, P=7, max_iterations=4)
    la = sorted(
        (r["src"], r["dst"],
         tuple(round(x, 12) for x in r["lam_s"]),
         tuple(round(x, 12) for x in r["lam_d"]))
        for r in a.multipliers.collect()
    )
    lb = sorted(
        (r["src"], r["dst"],
         tuple(round(x, 12) for x in r["lam_s"]),
         tuple(round(x, 12) for x in r["lam_d"]))
        for r in b.multipliers.collect()
    )
    assert la == lb
