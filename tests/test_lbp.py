"""Loopy BP vs exact sum-product (tree) and a numpy superstep replica
(reference semantics: graphical_models/lbp_structured_prediction.cpp)."""

from __future__ import annotations

import numpy as np
import pytest

from powergraph_spark.algorithms.lbp import (
    belief_probabilities,
    lbp,
)
from powergraph_spark.graph import Graph

NS = 3  # states


def _edge_factor(lam_w, k):
    """exp((xi==xj) ? 0 : -lam_w) Potts matrix."""
    m = np.full((k, k), np.exp(-lam_w))
    np.fill_diagonal(m, 1.0)
    return m


def _exact_marginals(edges, pots, lam, k):
    """Brute-force joint enumeration — exact for small graphs."""
    ids = sorted(pots)
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    marg = {v: np.zeros(k) for v in ids}
    fac = {e: _edge_factor(lam * w, k) for e, w in edges.items()}
    for assign in np.ndindex(*([k] * n)):
        p = 1.0
        for v in ids:
            p *= np.exp(pots[v][assign[idx[v]]])
        for (a, b), f in fac.items():
            p *= f[assign[idx[a]], assign[idx[b]]]
        for v in ids:
            marg[v][assign[idx[v]]] += p
    return {v: m / m.sum() for v, m in marg.items()}


def _np_lbp(edges, pots, lam, damping, k, iters):
    """Synchronous-flooding replica of the engine: factored Potts
    convolution, max-normalized messages/beliefs, damped mix."""
    msgs = {}
    for (a, b), w in edges.items():
        msgs[(a, b)] = np.zeros(k)
        msgs[(b, a)] = np.zeros(k)
    nbrs = {}
    for (a, b), w in edges.items():
        nbrs.setdefault(a, []).append((b, w))
        nbrs.setdefault(b, []).append((a, w))

    def beliefs():
        out = {}
        for v, pvec in pots.items():
            b = pvec.copy()
            for u, w in nbrs.get(v, []):
                b = b + msgs[(u, v)]
            out[v] = b - b.max()
        return out

    for _ in range(iters):
        bel = beliefs()
        new = {}
        for (s, t), m in msgs.items():
            w = edges.get((s, t), edges.get((t, s)))
            cav = bel[s] - msgs[(t, s)]
            e = np.exp(cav)
            fac = np.exp(-(lam * w))
            nm = np.log(fac * e.sum() + (1.0 - fac) * e)
            nm = nm - nm.max()
            new[(s, t)] = damping * m + (1.0 - damping) * nm
        msgs.update(new)
    return beliefs()


def _run(spark, edges, pots, P=4, **kw):
    edf = spark.createDataFrame(
        [(a, b, float(w)) for (a, b), w in edges.items()],
        "src long, dst long, w double",
    )
    g = Graph.from_edges(edf.select("src", "dst", "w"), num_partitions=P)
    pdf = spark.createDataFrame(
        [(v, [float(x) for x in p]) for v, p in pots.items()],
        "id long, potential array<double>",
    )
    return lbp(g, pdf, weight_col="w", **kw)


def _star_tree():
    """5-vertex star + a chain tail: a tree with diameter 4."""
    edges = {(0, 1): 1.0, (0, 2): 0.5, (0, 3): 1.5, (3, 4): 1.0,
             (4, 5): 0.7}
    rng = np.random.RandomState(7)
    pots = {v: np.log(rng.dirichlet(np.ones(NS)) + 0.05)
            for v in range(6)}
    return edges, pots


def test_lbp_exact_on_tree(spark):
    """On a tree, converged sum-product beliefs == exact marginals."""
    edges, pots = _star_tree()
    res = _run(spark, edges, pots, damping=0.0, tolerance=1e-10,
               max_iterations=30)
    assert res.gas.termination == "TASK_DEPLETION"
    got = {
        r["id"]: np.array(r["probs"])
        for r in belief_probabilities(res.beliefs).collect()
    }
    want = _exact_marginals(edges, pots, 2.0, NS)
    for v, p in want.items():
        np.testing.assert_allclose(got[v], p, rtol=1e-6, atol=1e-8)


def test_lbp_matches_numpy_replica(spark):
    """Fixed 4 supersteps on a LOOPY graph must replay the replica
    exactly (same factored convolution + damping op order)."""
    edges = {(0, 1): 1.0, (1, 2): 0.8, (2, 0): 1.2, (2, 3): 1.0,
             (3, 4): 0.6, (4, 2): 1.1}
    rng = np.random.RandomState(3)
    pots = {v: np.log(rng.dirichlet(np.ones(NS)) + 0.02)
            for v in range(5)}
    res = _run(spark, edges, pots, damping=0.1, tolerance=0.0,
               max_iterations=4)
    got = {r["id"]: np.array(r["belief"])
           for r in res.beliefs.collect()}
    want = _np_lbp(edges, pots, 2.0, 0.1, NS, iters=4)
    for v in pots:
        np.testing.assert_allclose(got[v], want[v], rtol=1e-9,
                                   atol=1e-12)


def test_lbp_grid_converges(spark):
    """4x4 grid MRF with attractive potentials: residuals deplete and
    the MAP labeling matches the replica's argmax fixpoint."""
    n = 4
    edges = {}
    for i in range(n):
        for j in range(n):
            v = i * n + j
            if j + 1 < n:
                edges[(v, v + 1)] = 1.0
            if i + 1 < n:
                edges[(v, v + n)] = 1.0
    rng = np.random.RandomState(11)
    pots = {v: np.array([0.5, -0.5]) if rng.rand() < 0.7
            else np.array([-0.5, 0.5]) for v in range(n * n)}
    res = _run(spark, edges, pots, max_iterations=60, tolerance=1e-6)
    assert res.gas.termination == "TASK_DEPLETION"
    want = _np_lbp(edges, pots, 2.0, 0.1, 2, iters=res.gas.supersteps)
    got = {r["id"]: r["label"] for r in res.beliefs.collect()}
    for v in pots:
        assert got[v] == int(np.argmax(want[v]))
    # attractive smoothing on a 70/30 prior field: majority label wins
    assert sum(1 for v in got.values() if v == 0) > len(got) / 2


def test_lbp_parallelism_invariance(spark):
    edges, pots = _star_tree()
    a = _run(spark, edges, pots, P=2, max_iterations=5, tolerance=0.0)
    b = _run(spark, edges, pots, P=7, max_iterations=5, tolerance=0.0)
    ba = sorted(
        (r["id"], tuple(round(x, 12) for x in r["belief"]))
        for r in a.beliefs.collect()
    )
    bb = sorted(
        (r["id"], tuple(round(x, 12) for x in r["belief"]))
        for r in b.beliefs.collect()
    )
    assert ba == bb


def test_lbp_isolated_vertex_keeps_prior(spark):
    """A vertex with no edges holds belief == potential (:318-321)."""
    edges = {(0, 1): 1.0}
    pots = {0: np.array([0.1, -0.2]), 1: np.array([0.0, 0.0]),
            7: np.array([-1.0, -2.0])}
    res = _run(spark, edges, pots, max_iterations=3, tolerance=0.0)
    got = {r["id"]: np.array(r["belief"]) for r in res.beliefs.collect()}
    np.testing.assert_allclose(got[7], pots[7] - pots[7].max(),
                               atol=1e-15)
