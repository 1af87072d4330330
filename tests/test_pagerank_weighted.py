"""Weighted PageRank vs replica + unweighted differential."""

from __future__ import annotations

import pytest
from oracles import powerlaw_edges

from powergraph_spark.algorithms import pagerank, pagerank_weighted
from powergraph_spark.graph import Graph

W_EDGES = [
    (1, 2, 10.0), (1, 3, 1.0), (2, 3, 2.0), (3, 1, 1.0),
    (4, 1, 5.0), (4, 2, 5.0), (2, 4, 1.0),
]


def _replica(edges, iters, damping=0.85):
    verts = sorted({v for e in edges for v in e[:2]})
    wout = {v: 0.0 for v in verts}
    for s, d, w in edges:
        wout[s] += w
    r = {v: 1.0 for v in verts}
    for _ in range(iters):
        g = {v: 0.0 for v in verts}
        for s, d, w in edges:
            if wout[s] > 0:
                g[d] += r[s] * (w / wout[s])
        r = {v: 0.15 + damping * g[v] for v in verts}
    return r


def test_weighted_matches_replica(spark):
    df = spark.createDataFrame(W_EDGES, "src long, dst long, weight double")
    g = Graph.from_edges(df, num_partitions=4)
    res = pagerank_weighted(g, tol=0.0, max_iterations=3)
    got = {r["id"]: r["rank"] for r in res.state.collect()}
    exp = _replica(W_EDGES, 3)
    assert set(got) == set(exp)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-12)
    g.unpersist()


def test_weight_one_reduces_to_unweighted(spark):
    edges = powerlaw_edges(150, seed=5)
    wdf = spark.createDataFrame(
        [(s, d, 1.0) for s, d in edges], "src long, dst long, weight double"
    )
    gw = Graph.from_edges(wdf, num_partitions=4)
    gu = Graph.from_pandas(spark, edges, num_partitions=4)
    rw = pagerank_weighted(gw, tol=0.0, max_iterations=4)
    ru = pagerank(gu, tol=0.0, max_iterations=4)
    a = {r["id"]: r["rank"] for r in rw.state.collect()}
    b = {r["id"]: r["rank"] for r in ru.state.collect()}
    assert set(a) == set(b)
    for v in a:
        assert a[v] == pytest.approx(b[v], abs=1e-12)
    gw.unpersist()
    gu.unpersist()


def test_weights_steer_rank(spark):
    # a splits rank 10:1 between b and c -> b must outrank c
    df = spark.createDataFrame(
        [(0, 1, 10.0), (0, 2, 1.0), (1, 0, 1.0), (2, 0, 1.0)],
        "src long, dst long, weight double",
    )
    g = Graph.from_edges(df, num_partitions=2)
    res = pagerank_weighted(g, tol=1e-4, max_iterations=100)
    got = {r["id"]: r["rank"] for r in res.state.collect()}
    assert got[1] > got[2]
    assert res.converged
    g.unpersist()
