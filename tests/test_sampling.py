"""md5-replica oracle for GraphSAGE-style fixed-fanout neighbor
sampling (algorithms/sampling.py)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from powergraph_spark.algorithms.sampling import neighbor_sample
from powergraph_spark.graph import Graph

EDGES = [(1, 2), (1, 3), (1, 4), (2, 4), (3, 4), (4, 5)]


def _replica(edges, seed_ids, fanouts, seed=42):
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    out = []
    frontier = sorted(set(seed_ids))
    for hop, f in enumerate(fanouts, start=1):
        nxt = set()
        for s in frontier:
            ranked = sorted(
                adj[s],
                key=lambda d: (
                    hashlib.md5(f"{seed}|{s}|{d}".encode()).hexdigest(),
                    d,
                ),
            )[:f]
            for d in ranked:
                out.append((hop, s, d))
                nxt.add(d)
        frontier = sorted(nxt)
    return sorted(out)


def test_neighbor_sample_matches_md5_replica(spark):
    g = Graph.from_pandas(spark, EDGES, num_partitions=4)
    seeds = spark.createDataFrame([(1,), (5,)], "id long")
    got = sorted(
        (r["hop"], r["src"], r["dst"])
        for r in neighbor_sample(g, seeds, fanouts=[2, 1], seed=42).collect()
    )
    assert got == _replica(EDGES, [1, 5], [2, 1])
    # fanout larger than any degree = full neighborhood expansion
    got_all = sorted(
        (r["hop"], r["src"], r["dst"])
        for r in neighbor_sample(g, seeds, fanouts=[10], seed=7).collect()
    )
    assert got_all == _replica(EDGES, [1, 5], [10], seed=7)


def test_neighbor_sample_reproducible_and_partition_invariant(spark):
    g4 = Graph.from_pandas(spark, EDGES, num_partitions=4)
    g8 = Graph.from_pandas(spark, EDGES, num_partitions=8)
    seeds = spark.createDataFrame([(1,)], "id long")
    a = sorted(map(tuple, neighbor_sample(g4, seeds, [2, 2]).collect()))
    b = sorted(map(tuple, neighbor_sample(g8, seeds, [2, 2]).collect()))
    c = sorted(map(tuple, neighbor_sample(g4, seeds, [2, 2]).collect()))
    assert a == b == c
    # a different seed changes the draw on some vertex with degree > fanout
    d = sorted(map(tuple, neighbor_sample(g4, seeds, [2, 2], seed=1).collect()))
    assert {t[1:] for t in a} != {t[1:] for t in d} or a == d  # allow tiny-graph tie
