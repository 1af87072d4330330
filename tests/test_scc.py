"""Strongly connected components (algorithms/scc.py) vs a Tarjan
replica, including a fixture that forces multiple coloring phases."""

from __future__ import annotations

from collections import defaultdict

from powergraph_spark.algorithms import scc
from powergraph_spark.graph import Graph


def _tarjan_max_labels(edges, vertices):
    g = defaultdict(list)
    for a, b in edges:
        g[a].append(b)
    index, low, onstk, stk = {}, {}, {}, []
    c = [0]
    out = {}
    for s0 in sorted(vertices):
        if s0 in index:
            continue
        work = [(s0, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = c[0]
                c[0] += 1
                stk.append(v)
                onstk[v] = True
            rec = False
            for j in range(pi, len(g[v])):
                w = g[v][j]
                if w not in index:
                    work[-1] = (v, j + 1)
                    work.append((w, 0))
                    rec = True
                    break
                elif onstk.get(w):
                    low[v] = min(low[v], index[w])
            if rec:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stk.pop()
                    onstk[w] = False
                    comp.append(w)
                    if w == v:
                        break
                m = max(comp)
                for w in comp:
                    out[w] = m
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])
    return out


def _run(spark, edges, P=4, **kw):
    edf = spark.createDataFrame(edges, "src long, dst long")
    g = Graph.from_edges(edf, num_partitions=P)
    res = scc(g, **kw)
    got = {r["id"]: r["scc"] for r in res.state.collect()}
    verts = {v for e in edges for v in e}
    assert got == _tarjan_max_labels(edges, verts)
    return res


def test_scc_functional_graph(spark):
    """rho-shaped quadratic map: cycles of several sizes + tails
    (trim peels the tails, one coloring phase closes the cycles)."""
    N = 150
    edges = [(i, (i * i + 7) % N) for i in range(N)
             if (i * i + 7) % N != i]
    res = _run(spark, edges)
    assert res.phases == 1
    assert res.n_sccs > N // 2  # mostly singletons + a few cycles


def test_scc_needs_multiple_phases(spark):
    """Two cycles bridged high->low: the low cycle inherits the high
    root's color in phase 1 and must wait for phase 2 (trim can't
    peel anything — every vertex is on a cycle)."""
    edges = [(10, 11), (11, 12), (12, 10),   # cycle A (max 12)
             (0, 1), (1, 2), (2, 0),          # cycle B (max 2)
             (12, 0)]                          # bridge A -> B
    res = _run(spark, edges)
    assert res.phases == 2
    assert res.n_sccs == 2


def test_scc_dag_is_all_singletons(spark):
    edges = [(i, j) for i in range(8) for j in range(i + 1, 8)
             if (i + j) % 3 == 0]
    res = _run(spark, edges)
    assert res.n_sccs == len({v for e in edges for v in e})


def test_scc_partitioning_invariant(spark):
    N = 90
    edges = [(i, (i * i + 7) % N) for i in range(N)
             if (i * i + 7) % N != i]
    outs = []
    for P in (2, 7):
        edf = spark.createDataFrame(edges, "src long, dst long")
        g = Graph.from_edges(edf.repartition(P), num_partitions=P)
        res = scc(g, num_partitions=P)
        outs.append(sorted(map(tuple, res.state.collect())))
    assert outs[0] == outs[1]
