"""MPLP MAP inference vs a numpy superstep replica and brute-force MAP
(reference semantics: graphical_models/mplp_denoise.cpp, Globerson &
Jaakkola coordinate descent under the synchronous-engine schedule)."""

from __future__ import annotations

import numpy as np

from powergraph_spark.algorithms.mplp import mplp_map
from powergraph_spark.graph import Graph

from test_dd import _brute_map, _loopy, _potts


def _np_mplp(edges, pots, k, iters, damping=0.0, fac=None):
    """Replica of the engine superstep: per-variable message sums,
    Jacobi MPLP update del_s'[a] = -(lam_s[a])/2 +
    max_b(fpot[a,b] + lam_d[b])/2 with lam = theta + (msum - own),
    dual/primal/agreement evaluated at the INCOMING messages. Stops
    after the sweep whose incoming iterate certifies (the decoded
    config attains every factor's reparameterized max), mirroring the
    engine's depletion ballot."""
    fac = fac or {e: _potts(2.0 * w, k) for e, w in edges.items()}
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    dels = {e: (np.zeros(k), np.zeros(k)) for e in edges}
    duals, primals = [], []
    bel = {v: pots[v] for v in deg}
    for _ in range(iters):
        msum = {v: np.zeros(k) for v in deg}
        for (a, b), (ds, dd) in dels.items():
            msum[a] = msum[a] + ds
            msum[b] = msum[b] + dd
        bel = {v: pots[v] + msum[v] for v in deg}
        xs = {v: int(np.argmax(bel[v])) for v in deg}
        dual = sum(b.max() for b in bel.values())
        primal = sum(pots[v][xs[v]] for v in deg)
        new, agree = {}, True
        for (a, b), (ds, dd) in dels.items():
            lam_s = pots[a] + (msum[a] - ds)
            lam_d = pots[b] + (msum[b] - dd)
            rep = fac[(a, b)] - ds[:, None] - dd[None, :]
            dual += rep.max()
            primal += fac[(a, b)][xs[a], xs[b]]
            agree = agree and rep[xs[a], xs[b]] == rep.max()
            nds = -(lam_s) / 2 + (fac[(a, b)] + lam_d[None, :]).max(1) / 2
            ndd = -(lam_d) / 2 + (fac[(a, b)] + lam_s[:, None]).max(0) / 2
            new[(a, b)] = (damping * ds + (1 - damping) * nds,
                           damping * dd + (1 - damping) * ndd)
        dels = new
        duals.append(dual)
        primals.append(primal)
        if agree:
            break
    # decode at the LAST CHECKED iterate (the engine's convention)
    labels = {v: int(np.argmax(bel[v])) if v in deg
              else int(np.argmax(pots[v])) for v in pots}
    return dels, labels, duals, primals


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
    return mplp_map(g, pdf, num_states=k, weight_col="w", **kw)


def test_mplp_matches_numpy_replica(spark):
    """Fixed 4 sweeps must replay the replica exactly: messages,
    decoded labels, and the dual/primal metrics stream."""
    edges, pots = _loopy()
    res = _run(spark, edges, pots, k=3, max_iterations=4)
    dels, labels, duals, primals = _np_mplp(edges, pots, 3, iters=4)
    got = {(r["src"], r["dst"]): (np.array(r["del_s"]),
                                  np.array(r["del_d"]))
           for r in res.messages.collect()}
    for e, (ds, dd) in dels.items():
        np.testing.assert_allclose(got[e][0], ds, atol=1e-12)
        np.testing.assert_allclose(got[e][1], dd, atol=1e-12)
    assert {r["id"]: r["label"]
            for r in res.assignments.collect()} == labels
    md = [m.extras["dual"] for m in res.gas.metrics]
    mp = [m.extras["primal"] for m in res.gas.metrics]
    np.testing.assert_allclose(md, duals, atol=1e-9)
    np.testing.assert_allclose(mp, primals, atol=1e-9)


def test_mplp_damped_matches_numpy_replica(spark):
    edges, pots = _loopy()
    res = _run(spark, edges, pots, k=3, max_iterations=3, damping=0.5)
    dels, labels, _, _ = _np_mplp(edges, pots, 3, iters=3, damping=0.5)
    got = {(r["src"], r["dst"]): (np.array(r["del_s"]),
                                  np.array(r["del_d"]))
           for r in res.messages.collect()}
    for e, (ds, dd) in dels.items():
        np.testing.assert_allclose(got[e][0], ds, atol=1e-12)
        np.testing.assert_allclose(got[e][1], dd, atol=1e-12)
    assert {r["id"]: r["label"]
            for r in res.assignments.collect()} == labels


def test_mplp_certifies_exact_map(spark):
    """Agreement termination: every factor's reparameterized argmax
    matches both unary argmaxes, the decode is the brute-force MAP,
    and (message sums telescope) dual == primal == MAP score."""
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


def test_mplp_exact_on_tree(spark):
    """MPLP is exact on trees: a path MRF with mixed-sign potentials
    converges to the brute-force MAP with a dual == primal
    certificate."""
    edges = {(0, 1): 1.0, (1, 2): 0.7, (2, 3): 1.3}
    rng = np.random.RandomState(11)
    pots = {v: np.log(rng.dirichlet(np.ones(3)) + 0.05) for v in range(4)}
    res = _run(spark, edges, pots, k=3, max_iterations=100)
    want_score, want_x = _brute_map(edges, pots, 3)
    assert res.agreement
    assert {r["id"]: r["label"]
            for r in res.assignments.collect()} == want_x
    np.testing.assert_allclose(res.dual, want_score, atol=1e-9)


def test_mplp_weak_duality_and_primal_best(spark):
    """L(delta) upper-bounds the MAP score for EVERY delta, so at
    every check: dual >= brute-force MAP >= decoded primal."""
    edges, pots = _loopy()
    res = _run(spark, edges, pots, k=3, max_iterations=10)
    want_score, _ = _brute_map(edges, pots, 3)
    for m in res.gas.metrics:
        assert m.extras["dual"] >= want_score - 1e-9
        assert m.extras["primal"] <= want_score + 1e-9
    assert res.primal_best == max(
        m.extras["primal"] for m in res.gas.metrics)


def test_mplp_custom_factor_table(spark):
    """A non-Potts asymmetric factor table via factor_expr replays the
    replica (the row-major src-major encoding is load-bearing)."""
    edges = {(0, 1): 1.0, (1, 2): 1.0}
    pots = {0: np.array([0.3, -0.1]), 1: np.array([0.0, 0.05]),
            2: np.array([-0.2, 0.4])}
    fac_np = np.array([[0.0, 0.7 - 1.1], [-0.3 - 1.1, -0.3 + 0.7]])
    fac = {e: fac_np for e in edges}
    expr = ("transform(sequence(0, 3), i -> "
            "-0.3E0 * CAST(i div 2 AS DOUBLE) "
            "+ 0.7E0 * CAST(i % 2 AS DOUBLE) "
            "- 1.1E0 * CAST((i div 2) != (i % 2) AS DOUBLE))")
    edf = spark.createDataFrame(
        [(a, b) for (a, b) in edges], "src long, dst long")
    g = Graph.from_edges(edf, num_partitions=3)
    pdf = spark.createDataFrame(
        [(v, [float(x) for x in p]) for v, p in pots.items()],
        "id long, potential array<double>",
    )
    res = mplp_map(g, pdf, num_states=2, factor_expr=expr,
                   max_iterations=3)
    dels, labels, _, _ = _np_mplp(edges, pots, 2, iters=3, fac=fac)
    got = {(r["src"], r["dst"]): (np.array(r["del_s"]),
                                  np.array(r["del_d"]))
           for r in res.messages.collect()}
    for e, (ds, dd) in dels.items():
        np.testing.assert_allclose(got[e][0], ds, atol=1e-12)
        np.testing.assert_allclose(got[e][1], dd, atol=1e-12)
    assert {r["id"]: r["label"]
            for r in res.assignments.collect()} == labels


def test_mplp_parallelism_invariance(spark):
    """Dyadic potentials + Potts(-2): every value in the trajectory is
    a small binary fraction, sums are exact in any association order,
    so messages are byte-identical across partition counts."""
    edges = {(0, 1): 1.0, (1, 2): 1.0, (2, 0): 1.0, (2, 3): 1.0}
    pots = {0: np.array([0.25, -0.5]), 1: np.array([-0.75, 0.125]),
            2: np.array([0.0, -0.25]), 3: np.array([0.5, -1.0])}
    a = _run(spark, edges, pots, k=2, P=2, max_iterations=4)
    b = _run(spark, edges, pots, k=2, P=7, max_iterations=4)
    la = {(r["src"], r["dst"]): (r["del_s"], r["del_d"])
          for r in a.messages.collect()}
    lb = {(r["src"], r["dst"]): (r["del_s"], r["del_d"])
          for r in b.messages.collect()}
    assert la == lb  # exact equality, not allclose


def test_mplp_run_to_max_ignores_certificate(spark):
    """stop_at_agreement=False runs every sweep even once certified —
    the fixed-iteration-count mode replay oracles rely on."""
    edges = {(0, 1): 1.0, (1, 2): 1.0, (2, 3): 1.0, (3, 0): 1.0,
             (1, 4): 0.5}
    pots = {0: np.array([1.2, -0.3]), 1: np.array([0.8, -0.1]),
            2: np.array([-0.4, 0.2]), 3: np.array([0.9, -0.6]),
            4: np.array([-0.2, 0.1])}
    early = _run(spark, edges, pots, k=2, max_iterations=8)
    full = _run(spark, edges, pots, k=2, max_iterations=8,
                stop_at_agreement=False)
    assert early.gas.termination == "TASK_DEPLETION"
    assert len(early.gas.metrics) < 8
    assert full.gas.termination == "MAX_ITERATIONS"
    assert len(full.gas.metrics) == 8
    # the certificate was reached mid-run (a zero-gap check exists) —
    # and the undamped Jacobi sweep is allowed to leave it afterwards
    # (parallel MPLP oscillates without damping; that is what the
    # damping knob is for), so no agreement claim on the final state
    assert any(abs(m.metric) < 1e-9 for m in full.gas.metrics)
    want_x = _brute_map(edges, pots, 2)[1]
    assert {r["id"]: r["label"]
            for r in early.assignments.collect()} == want_x


def test_mplp_isolated_vertex_keeps_prior_argmax(spark):
    edges = {(0, 1): 1.0}
    pots = {0: np.array([0.1, -0.2]), 1: np.array([0.0, 0.0]),
            7: np.array([-1.0, -0.5])}
    res = _run(spark, edges, pots, k=2, max_iterations=3)
    got = {r["id"]: r["label"] for r in res.assignments.collect()}
    assert got[7] == 1
