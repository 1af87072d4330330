"""Dual-decomposition MAP vs a numpy superstep replica and brute-force
MAP (reference semantics: graphical_models/dd_grlab.hpp symmetric
subgradient program)."""

from __future__ import annotations

import itertools

import numpy as np

from powergraph_spark.algorithms.dd import dual_decomposition_map
from powergraph_spark.graph import Graph


def _potts(lam_w, k):
    """Log-space Potts table: 0 on the diagonal, -lam_w off it."""
    m = np.full((k, k), -lam_w)
    np.fill_diagonal(m, 0.0)
    return m


def _brute_map(edges, pots, k, fac=None):
    """Exhaustive argmax of sum(pot) + sum(factor); first-wins ties."""
    ids = sorted(pots)
    idx = {v: i for i, v in enumerate(ids)}
    fac = fac or {e: _potts(2.0 * w, k) for e, w in edges.items()}
    best, best_x = -np.inf, None
    for assign in itertools.product(range(k), repeat=len(ids)):
        s = sum(pots[v][assign[idx[v]]] for v in ids)
        s += sum(f[assign[idx[a]], assign[idx[b]]]
                 for (a, b), f in fac.items())
        if s > best + 1e-12:
            best, best_x = s, assign
    return best, {v: best_x[idx[v]] for v in ids}


def _np_dd(edges, pots, k, iters, step=1.0, fac=None):
    """Replica of the engine superstep: unary argmax over pot + sum
    lambda, factor argmax over fpot - lam_s - lam_d (row-major,
    first-index ties), subgradient step s_t = step/(t+2)."""
    fac = fac or {e: _potts(2.0 * w, k) for e, w in edges.items()}
    lam = {e: (np.zeros(k), np.zeros(k)) for e in edges}
    duals, primals = [], []
    for t in range(iters):
        bel = {v: p.copy() for v, p in pots.items()}
        for (a, b), (ls, ld) in lam.items():
            bel[a] = bel[a] + ls
            bel[b] = bel[b] + ld
        xs = {v: int(np.argmax(b)) for v, b in bel.items()}
        dual = sum(b.max() for b in bel.values())
        primal = sum(pots[v][xs[v]] for v in pots)
        s_t = step / (t + 2)
        for (a, b), (ls, ld) in lam.items():
            fb = fac[(a, b)] - ls[:, None] - ld[None, :]
            fidx = int(np.argmax(fb))  # row-major first-wins
            fa, fb_state = fidx // k, fidx % k
            dual += fb.flat[fidx]
            primal += fac[(a, b)][xs[a], xs[b]]
            ls2, ld2 = ls.copy(), ld.copy()
            ls2[fa] += s_t
            ls2[xs[a]] -= s_t
            ld2[fb_state] += s_t
            ld2[xs[b]] -= s_t
            lam[(a, b)] = (ls2, ld2)
        duals.append(dual)
        primals.append(primal)
    # final decode at the updated multipliers
    bel = {v: p.copy() for v, p in pots.items()}
    for (a, b), (ls, ld) in lam.items():
        bel[a] = bel[a] + ls
        bel[b] = bel[b] + ld
    labels = {v: int(np.argmax(b)) for v, b in bel.items()}
    return lam, labels, duals, primals


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
    return dual_decomposition_map(g, pdf, num_states=k,
                                  weight_col="w", **kw)


def _loopy():
    """5-vertex loopy graph with mixed weights and 3-state priors."""
    edges = {(0, 1): 1.0, (1, 2): 0.8, (2, 0): 1.2, (2, 3): 1.0,
             (3, 4): 0.6, (4, 2): 1.1}
    rng = np.random.RandomState(5)
    pots = {v: np.log(rng.dirichlet(np.ones(3)) + 0.02)
            for v in range(5)}
    return edges, pots


def test_dd_matches_numpy_replica(spark):
    """Fixed 4 iterations must replay the replica exactly: multipliers,
    decoded labels, and the dual/primal metrics stream."""
    edges, pots = _loopy()
    res = _run(spark, edges, pots, k=3, max_iterations=4)
    lam, labels, duals, primals = _np_dd(edges, pots, 3, iters=4)
    got = {(r["src"], r["dst"]): (np.array(r["lam_s"]),
                                  np.array(r["lam_d"]))
           for r in res.multipliers.collect()}
    for e, (ls, ld) in lam.items():
        np.testing.assert_allclose(got[e][0], ls, atol=1e-12)
        np.testing.assert_allclose(got[e][1], ld, atol=1e-12)
    got_labels = {r["id"]: r["label"]
                  for r in res.assignments.collect()}
    assert got_labels == labels
    # the metrics stream carries the reference's objective aggregator:
    # dual_t / primal_t evaluated at the incoming multipliers
    md = [m.extras["dual"] for m in res.gas.metrics]
    mp = [m.extras["primal"] for m in res.gas.metrics]
    np.testing.assert_allclose(md, duals, atol=1e-9)
    np.testing.assert_allclose(mp, primals, atol=1e-9)


def test_dd_certifies_exact_map(spark):
    """Strong-signal instance: agreement is reached, the decoded
    labels are the brute-force MAP, and dual == primal == MAP score
    (the duality-gap certificate)."""
    edges = {(0, 1): 1.0, (1, 2): 1.0, (2, 3): 1.0, (3, 0): 1.0,
             (1, 4): 0.5}
    pots = {0: np.array([1.2, -0.3]), 1: np.array([0.8, -0.1]),
            2: np.array([-0.4, 0.2]), 3: np.array([0.9, -0.6]),
            4: np.array([-0.2, 0.1])}
    res = _run(spark, edges, pots, k=2, max_iterations=100)
    want_score, want_x = _brute_map(edges, pots, 2)
    got = {r["id"]: r["label"] for r in res.assignments.collect()}
    assert res.agreement
    assert res.gas.termination == "TASK_DEPLETION"
    assert got == want_x
    np.testing.assert_allclose(res.dual, want_score, atol=1e-9)
    np.testing.assert_allclose(res.primal, want_score, atol=1e-9)


def test_dd_weak_duality_and_primal_best(spark):
    """At every check: dual >= brute-force MAP >= decoded primal, and
    primal_best is the running max of the primal stream."""
    edges, pots = _loopy()
    res = _run(spark, edges, pots, k=3, max_iterations=12)
    want_score, _ = _brute_map(edges, pots, 3)
    duals = [m.extras["dual"] for m in res.gas.metrics]
    primals = [m.extras["primal"] for m in res.gas.metrics]
    for d, p in zip(duals, primals):
        assert d >= want_score - 1e-9
        assert p <= want_score + 1e-9
    assert res.primal_best == max(primals)


def test_dd_custom_factor_table(spark):
    """A non-Potts asymmetric factor table via factor_expr replays the
    replica (the row-major src-major encoding is load-bearing)."""
    edges = {(0, 1): 1.0, (1, 2): 1.0}
    pots = {0: np.array([0.3, -0.1]), 1: np.array([0.0, 0.05]),
            2: np.array([-0.2, 0.4])}
    # fpot[a*2+b] = -0.3*a + 0.7*b - 1.1*(a XOR b), distinct per config
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
    res = dual_decomposition_map(g, pdf, num_states=2,
                                 factor_expr=expr, max_iterations=3)
    lam, labels, _, _ = _np_dd(edges, pots, 2, iters=3, fac=fac)
    got = {(r["src"], r["dst"]): (np.array(r["lam_s"]),
                                  np.array(r["lam_d"]))
           for r in res.multipliers.collect()}
    for e, (ls, ld) in lam.items():
        np.testing.assert_allclose(got[e][0], ls, atol=1e-12)
        np.testing.assert_allclose(got[e][1], ld, atol=1e-12)
    assert {r["id"]: r["label"]
            for r in res.assignments.collect()} == labels


def test_dd_parallelism_invariance(spark):
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


def test_dd_isolated_vertex_keeps_prior_argmax(spark):
    """A vertex with no incident factor decodes to argmax(potential)."""
    edges = {(0, 1): 1.0}
    pots = {0: np.array([0.1, -0.2]), 1: np.array([0.0, 0.0]),
            7: np.array([-1.0, -0.5])}
    res = _run(spark, edges, pots, k=2, max_iterations=3)
    got = {r["id"]: r["label"] for r in res.assignments.collect()}
    assert got[7] == 1


# --- projected variant (dd_vertex_program_projected, :656-871) --------


def _np_dd_projected(edges, pots, k, iters, step=1.0, fac=None):
    """Replica of one engine superstep = one even/odd reference pair:
    factor phase fb = fpot + (lam_s + eps_s) + (lam_d + eps_d)
    (row-major, first-index ties) -> one-hot votes; variable phase
    votes/degree consensus, lambda += s_t * (votes/deg - local vote),
    s_t = step/(2t+3)."""
    fac = fac or {e: _potts(2.0 * w, k) for e, w in edges.items()}
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    eps = {v: pots[v] / deg[v] for v in deg}
    lam = {e: (np.zeros(k), np.zeros(k)) for e in edges}
    duals, primals = [], []
    votes = {}

    def onehot(j):
        z = np.zeros(k)
        z[j] = 1.0
        return z

    for t in range(iters):
        s_t = step / (2 * t + 3)
        votes = {v: np.zeros(k) for v in deg}
        fstars, dual = {}, 0.0
        for (a, b), (ls, ld) in lam.items():
            fb = (fac[(a, b)] + (ls + eps[a])[:, None]
                  + (ld + eps[b])[None, :])
            fidx = int(np.argmax(fb))  # row-major first-wins
            fa, fb_state = fidx // k, fidx % k
            dual += fb.flat[fidx]
            fstars[(a, b)] = (fa, fb_state)
            votes[a] += onehot(fa)
            votes[b] += onehot(fb_state)
        xs = {v: int(np.argmax(votes[v])) for v in votes}
        primal = sum(pots[v][xs[v]] for v in votes)
        for (a, b), (ls, ld) in lam.items():
            fa, fb_state = fstars[(a, b)]
            primal += fac[(a, b)][xs[a], xs[b]]
            lam[(a, b)] = (
                ls + s_t * (votes[a] / deg[a] - onehot(fa)),
                ld + s_t * (votes[b] / deg[b] - onehot(fb_state)),
            )
        duals.append(dual)
        primals.append(primal)
    labels = {v: int(np.argmax(votes[v])) if v in votes
              else int(np.argmax(pots[v])) for v in pots}
    return lam, labels, duals, primals


def _run_proj(spark, edges, pots, k, P=4, **kw):
    from powergraph_spark.algorithms.dd import dd_map_projected

    edf = spark.createDataFrame(
        [(a, b, float(w)) for (a, b), w in edges.items()],
        "src long, dst long, w double",
    )
    g = Graph.from_edges(edf.select("src", "dst", "w"), num_partitions=P)
    pdf = spark.createDataFrame(
        [(v, [float(x) for x in p]) for v, p in pots.items()],
        "id long, potential array<double>",
    )
    return dd_map_projected(g, pdf, num_states=k, weight_col="w", **kw)


def test_dd_projected_matches_numpy_replica(spark):
    """Fixed 4 pairs must replay the replica exactly: multipliers,
    decoded labels, and the dual/primal metrics stream."""
    edges, pots = _loopy()
    res = _run_proj(spark, edges, pots, k=3, max_iterations=4)
    lam, labels, duals, primals = _np_dd_projected(edges, pots, 3, iters=4)
    got = {(r["src"], r["dst"]): (np.array(r["lam_s"]),
                                  np.array(r["lam_d"]))
           for r in res.multipliers.collect()}
    for e, (ls, ld) in lam.items():
        np.testing.assert_allclose(got[e][0], ls, atol=1e-12)
        np.testing.assert_allclose(got[e][1], ld, atol=1e-12)
    assert {r["id"]: r["label"]
            for r in res.assignments.collect()} == labels
    md = [m.extras["dual"] for m in res.gas.metrics]
    mp = [m.extras["primal"] for m in res.gas.metrics]
    np.testing.assert_allclose(md, duals, atol=1e-9)
    np.testing.assert_allclose(mp, primals, atol=1e-9)


def test_dd_projected_certifies_exact_map(spark):
    """Consensus termination: every factor vote matches the variable
    majority, the decode is the brute-force MAP, and (because the
    per-vertex multiplier sums stay zero by the consensus-update
    invariant) dual == primal == MAP score."""
    edges = {(0, 1): 1.0, (1, 2): 1.0, (2, 3): 1.0, (3, 0): 1.0,
             (1, 4): 0.5}
    pots = {0: np.array([1.2, -0.3]), 1: np.array([0.8, -0.1]),
            2: np.array([-0.4, 0.2]), 3: np.array([0.9, -0.6]),
            4: np.array([-0.2, 0.1])}
    res = _run_proj(spark, edges, pots, k=2, max_iterations=100)
    want_score, want_x = _brute_map(edges, pots, 2)
    assert res.agreement
    assert res.gas.termination == "TASK_DEPLETION"
    assert {r["id"]: r["label"]
            for r in res.assignments.collect()} == want_x
    np.testing.assert_allclose(res.dual, want_score, atol=1e-9)
    np.testing.assert_allclose(res.primal, want_score, atol=1e-9)


def test_dd_projected_weak_duality(spark):
    """At every check: factor-sum dual >= brute-force MAP >= decoded
    primal (valid because sum_e lambda_e == 0 per vertex, an invariant
    of the consensus update started from zero)."""
    edges, pots = _loopy()
    res = _run_proj(spark, edges, pots, k=3, max_iterations=12)
    want_score, _ = _brute_map(edges, pots, 3)
    for m in res.gas.metrics:
        assert m.extras["dual"] >= want_score - 1e-9
        assert m.extras["primal"] <= want_score + 1e-9
    assert res.primal_best == max(
        m.extras["primal"] for m in res.gas.metrics)


def test_dd_projected_parallelism_invariance_exact(spark):
    """Byte-identical multipliers across partition counts: no float
    ever crosses an aggregation boundary in the projected program
    (vote counts are exact 0/1 sums; lambda updates are per-edge
    local expressions)."""
    edges, pots = _loopy()
    a = _run_proj(spark, edges, pots, k=3, P=2, max_iterations=5)
    b = _run_proj(spark, edges, pots, k=3, P=7, max_iterations=5)
    key = lambda r: (r["src"], r["dst"])  # noqa: E731
    la = {key(r): (r["lam_s"], r["lam_d"])
          for r in a.multipliers.collect()}
    lb = {key(r): (r["lam_s"], r["lam_d"])
          for r in b.multipliers.collect()}
    assert la == lb  # exact equality, not allclose


def test_dd_projected_isolated_vertex_keeps_prior_argmax(spark):
    edges = {(0, 1): 1.0}
    pots = {0: np.array([0.1, -0.2]), 1: np.array([0.0, 0.0]),
            7: np.array([-1.0, -0.5])}
    res = _run_proj(spark, edges, pots, k=2, max_iterations=3)
    got = {r["id"]: r["label"] for r in res.assignments.collect()}
    assert got[7] == 1
