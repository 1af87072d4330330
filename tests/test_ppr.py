"""Personalized PageRank vs replica + uniform-source differential."""

from __future__ import annotations

import pytest
from oracles import powerlaw_edges

from powergraph_spark.algorithms import personalized_pagerank
from powergraph_spark.graph import Graph

PL_EDGES = powerlaw_edges(120, seed=3)


def _replica(edges, sources, iters, damping=0.85):
    verts = sorted({v for e in edges for v in e})
    out = {v: 0 for v in verts}
    for s, _ in edges:
        out[s] += 1
    reset = {v: (0.15 if v in sources else 0.0) for v in verts}
    r = dict(reset)
    for _ in range(iters):
        g = {v: 0.0 for v in verts}
        for s, d in edges:
            g[d] += r[s] / out[s]
        r = {v: reset[v] + damping * g[v] for v in verts}
    return r


def test_ppr_matches_replica(spark):
    sources = [0, 1, 2]
    g = Graph.from_pandas(spark, PL_EDGES, num_partitions=4)
    res = personalized_pagerank(g, sources, tol=0.0, max_iterations=3)
    got = {r["id"]: r["rank"] for r in res.state.collect()}
    exp = _replica(PL_EDGES, set(sources), 3)
    assert set(got) == set(exp)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-12)
    g.unpersist()


def test_ppr_uniform_sources_recovers_pagerank(spark):
    # uniform source set shares the standard-pagerank fixpoint (the
    # inits differ — 0.15 vs 1.0 — so compare CONVERGED ranks against
    # a python fixpoint iterated well past the engine tolerance)
    edges = [(0, 5), (1, 0), (1, 5), (2, 0), (2, 5), (3, 0), (3, 5)]
    verts = sorted({v for e in edges for v in e})
    out = {v: 0 for v in verts}
    for s, _ in edges:
        out[s] += 1
    r = {v: 1.0 for v in verts}
    for _ in range(600):
        gsum = {v: 0.0 for v in verts}
        for s, d in edges:
            if out[s]:
                gsum[d] += r[s] / out[s]
        r = {v: 0.15 + 0.85 * gsum[v] for v in verts}

    g = Graph.from_pandas(spark, edges, num_partitions=2)
    res = personalized_pagerank(g, verts, tol=1e-9, max_iterations=300)
    got = {row["id"]: row["rank"] for row in res.state.collect()}
    assert res.converged
    for v in verts:
        assert got[v] == pytest.approx(r[v], abs=1e-7)
    g.unpersist()


def test_ppr_sources_dataframe_and_locality(spark):
    # two disconnected components; sources in one -> zero rank in other
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 10)]
    g = Graph.from_pandas(spark, edges, num_partitions=2)
    src_df = spark.createDataFrame([(1,)], "id long")
    res = personalized_pagerank(g, src_df, tol=1e-9, max_iterations=100)
    got = {r["id"]: r["rank"] for r in res.state.collect()}
    assert got[10] == 0.0 and got[11] == 0.0
    assert got[1] > got[2] > 0
    assert got[3] > 0
    g.unpersist()
