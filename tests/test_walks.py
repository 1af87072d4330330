"""Deterministic random-walk corpus generation (algorithms/walks.py)
vs a pure-python replica of the md5-indexed step rule."""

from __future__ import annotations

import hashlib

from powergraph_spark.algorithms import random_walks
from powergraph_spark.graph import Graph


def _u(seed: str, t: int, start: int, w: int) -> float:
    h = hashlib.md5(f"{seed}:{t}:{start}:{w}".encode()).hexdigest()
    return int(h[:8], 16) / 4294967296.0


def _replica(edges, vertices, W, L, seed):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    for a in adj:
        adj[a].sort()
    out = {}
    for v in vertices:
        for w in range(W):
            cur, path = v, [v]
            for t in range(L):
                nbrs = adj.get(cur)
                if nbrs:
                    cur = nbrs[int(_u(seed, t, v, w) * len(nbrs))]
                    path.append(cur)
            out[(v, w)] = path
    return out


def test_walks_match_replica_with_dead_ends(spark):
    # small DAG-ish graph: vertex 9 is a sink, 0 fans out
    edges = [(0, 1), (0, 2), (0, 3), (1, 4), (2, 4), (3, 9),
             (4, 9), (5, 0), (6, 5)]
    vertices = list(range(10))
    edf = spark.createDataFrame(edges, "src long, dst long")
    g = Graph.from_edges(edf, num_partitions=4)
    res = random_walks(g, walks_per_vertex=2, length=4, seed="tw")
    got = {
        (r["start"], r["w"]): list(r["path"])
        for r in res.walks.collect()
    }
    want = _replica(edges, sorted({v for e in edges for v in e}),
                    2, 4, "tw")
    assert got == want
    # sink walks never move
    assert got[(9, 0)] == [9] and got[(9, 1)] == [9]
    assert res.length == 4 and res.walks_per_vertex == 2


def test_walks_partitioning_invariant(spark):
    edges = [(i, (i * 7 + 1) % 50) for i in range(50)] + [
        (i, (i * 3 + 2) % 50) for i in range(50)
    ]
    edf = spark.createDataFrame(edges, "src long, dst long")
    outs = []
    for P in (2, 11):
        g = Graph.from_edges(edf.repartition(P), num_partitions=P)
        res = random_walks(
            g, walks_per_vertex=1, length=3, seed="tp",
            num_partitions=P,
        )
        outs.append(
            sorted(
                (r["start"], r["w"], tuple(r["path"]))
                for r in res.walks.collect()
            )
        )
    assert outs[0] == outs[1]


def test_walks_no_adjacency_arrays_in_plan(spark):
    """Hub safety: the step plan must not collect adjacency into
    per-vertex arrays — no collect_list aggregate anywhere."""
    edf = spark.createDataFrame(
        [(0, i) for i in range(1, 30)], "src long, dst long"
    )
    g = Graph.from_edges(edf, num_partitions=2)
    res = random_walks(g, walks_per_vertex=1, length=2, seed="th")
    plan = res.walks._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan
