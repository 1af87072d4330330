"""Chromatic Gibbs sampling (algorithms/gibbs.py) vs a pure-python
replica of the determinized chromatic schedule.

Reference semantics: graphical_models/deprecated/gibbs_sampling/
chromatic_sampler.cpp — color classes sweep sequentially, every vertex
of a class samples in parallel conditioned on its neighbors.
"""

from __future__ import annotations

import hashlib
import math

import pytest

from powergraph_spark.algorithms import chromatic_gibbs
from powergraph_spark.graph import Graph


def _u(seed: str, tag: str, i: int) -> float:
    h = hashlib.md5(f"{seed}:{tag}:{i}".encode()).hexdigest()
    return int(h[:8], 16) / 4294967296.0


def _replica(edges, n, colors, K, beta, sweeps, seed):
    nbrs = {i: [] for i in range(n)}
    for a, b in edges:
        nbrs[a].append(b)
        nbrs[b].append(a)
    x = {i: int(_u(seed, "init", i) * K) for i in range(n)}
    for t in range(sweeps):
        for c in sorted(set(colors.values())):
            newx = {}
            for i in range(n):
                if colors[i] != c:
                    continue
                cnt = [0] * K
                for j in nbrs[i]:
                    cnt[x[j]] += 1
                ps = [math.exp(beta * ck) for ck in cnt]
                s = sum(ps)
                u = _u(seed, f"{t}:{c}", i)
                acc = 0.0
                pick = K - 1
                for k in range(K - 1):
                    acc += ps[k]
                    if u < acc / s:
                        pick = k
                        break
                newx[i] = pick
            x.update(newx)
    return x


def _triangle_chain(spark, n=12):
    """Chain of triangles (odd cycles -> needs 3 colors): vertices
    3t, 3t+1, 3t+2 form a triangle; 3t+2 -- 3t+3 links them."""
    edges = []
    for t in range(n // 3):
        a, b, c = 3 * t, 3 * t + 1, 3 * t + 2
        edges += [(a, b), (b, c), (a, c)]
        if c + 1 < n:
            edges.append((c, c + 1))
    edf = spark.createDataFrame(edges, "src long, dst long")
    colors = {i: i % 3 for i in range(n)}
    cdf = spark.createDataFrame(
        list(colors.items()), "id long, color int"
    )
    return edges, edf, colors, cdf


def test_gibbs_matches_replica_k3(spark):
    n = 12
    edges, edf, colors, cdf = _triangle_chain(spark, n)
    g = Graph.from_edges(edf, num_partitions=4)
    res = chromatic_gibbs(
        g, cdf, n_states=3, beta=0.9, sweeps=2, seed="tg3",
        validate_coloring=True,
    )
    got = {r["id"]: r["x"] for r in res.state.collect()}
    assert got == _replica(edges, n, colors, 3, 0.9, 2, "tg3")
    assert res.n_colors == 3


def test_gibbs_beta_zero_is_pure_uniform(spark):
    """beta = 0 decouples neighbors: the sample is exactly the
    inverse-CDF of the per-vertex md5 draw, independent of the graph."""
    n = 20
    edf = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    cdf = spark.createDataFrame(
        [(i, i % 2) for i in range(n)], "id long, color int"
    )
    g = Graph.from_edges(edf, num_partitions=4)
    res = chromatic_gibbs(
        g, cdf, n_states=4, beta=0.0, sweeps=1, seed="tz"
    )
    got = {r["id"]: r["x"] for r in res.state.collect()}
    for i in range(n):
        c = i % 2
        expect = min(int(_u("tz", "0:" + str(c), i) * 4), 3)
        assert got[i] == expect


def test_gibbs_improper_coloring_raises(spark):
    edf = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    cdf = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1)], "id long, color int"
    )
    g = Graph.from_edges(edf, num_partitions=2)
    with pytest.raises(ValueError, match="improper coloring"):
        chromatic_gibbs(g, cdf, sweeps=1, validate_coloring=True)


def test_gibbs_partitioning_invariant(spark):
    n = 15
    edf = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    cdf = spark.createDataFrame(
        [(i, i % 2) for i in range(n)], "id long, color int"
    )
    outs = []
    for P in (1, 7):
        g = Graph.from_edges(edf.repartition(P), num_partitions=P)
        res = chromatic_gibbs(
            g, cdf, n_states=2, beta=0.5, sweeps=2, seed="tp",
            num_partitions=P,
        )
        outs.append(sorted(map(tuple, res.state.collect())))
    assert outs[0] == outs[1]


def test_gibbs_high_beta_smooths_chain(spark):
    """Strong positive coupling drives neighbor agreement well above
    the beta = 0 level on a long chain."""
    n = 120
    edf = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    cdf = spark.createDataFrame(
        [(i, i % 2) for i in range(n)], "id long, color int"
    )
    g = Graph.from_edges(edf, num_partitions=4)

    def agree_frac(beta):
        res = chromatic_gibbs(
            g, cdf, n_states=2, beta=beta, sweeps=3, seed="ts"
        )
        x = {r["id"]: r["x"] for r in res.state.collect()}
        agree = sum(1 for i in range(n - 1) if x[i] == x[i + 1])
        return agree / (n - 1)

    assert agree_frac(2.5) > agree_frac(0.0) + 0.15
