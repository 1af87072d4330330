"""Differential oracle for the BSP-determinized Louvain local-move
phase: an independent pure-python replica of the synchronous
integer-score rule, compared exactly on hand and pseudo-random
fixtures."""

from __future__ import annotations

from collections import Counter, defaultdict

from powergraph_spark.algorithms.louvain import louvain_moves
from powergraph_spark.graph import Graph


def _replica(edges, rounds):
    und = set()
    for a, b in edges:
        if a != b:
            und.add((min(a, b), max(a, b)))
    adj = defaultdict(list)
    for a, b in und:
        adj[a].append(b)
        adj[b].append(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    m = len(und)
    lab = {v: v for v in adj}
    for _ in range(rounds):
        sigma = defaultdict(int)
        for v, c in lab.items():
            sigma[c] += deg[v]
        csize = Counter(lab.values())
        new = {}
        for i in adj:
            k_ic = Counter(lab[n] for n in adj[i])
            cands = set(k_ic) | {lab[i]}
            best = None
            for c in sorted(cands):
                s = 2 * m * k_ic.get(c, 0) - deg[i] * (
                    sigma[c] - (deg[i] if c == lab[i] else 0)
                )
                if best is None or s > best[0]:
                    best = (s, c)
            bc = best[1]
            # singleton-swap guard (mirrors louvain.py)
            if csize[lab[i]] == 1 and csize[bc] == 1 and bc > lab[i]:
                bc = lab[i]
            new[i] = bc
        lab = new
    return lab


def _replica_weighted_rounds(wund, deg, m, rounds):
    """wund: dict {(a,b): w} with a<b, no self; deg: {id: weighted deg
    incl. 2*self}; mirrors louvain._move_rounds."""
    adj = defaultdict(dict)
    for (a, b), w in wund.items():
        adj[a][b] = adj[a].get(b, 0) + w
        adj[b][a] = adj[b].get(a, 0) + w
    verts = set(deg)
    lab = {v: v for v in verts}
    for _ in range(rounds):
        sigma = defaultdict(int)
        for v, c in lab.items():
            sigma[c] += deg[v]
        csize = Counter(lab.values())
        new = {}
        for i in verts:
            k_ic = defaultdict(int)
            for n, w in adj.get(i, {}).items():
                k_ic[lab[n]] += w
            cands = set(k_ic) | {lab[i]}
            best = None
            for c in sorted(cands):
                s = 2 * m * k_ic.get(c, 0) - deg[i] * (
                    sigma[c] - (deg[i] if c == lab[i] else 0)
                )
                if best is None or s > best[0]:
                    best = (s, c)
            bc = best[1]
            if csize[lab[i]] == 1 and csize[bc] == 1 and bc > lab[i]:
                bc = lab[i]
            new[i] = bc
        lab = new
    return lab


def _replica_multilevel(edges, rounds_per_level, levels):
    und = {}
    for a, b in edges:
        if a != b:
            k = (min(a, b), max(a, b))
            und[k] = 1  # dedup like the engine
    deg = defaultdict(int)
    for (a, b), w in und.items():
        deg[a] += w
        deg[b] += w
    m = sum(und.values())
    lab = _replica_weighted_rounds(und, dict(deg), m, rounds_per_level)
    cur = {k: w for k, w in und.items()}  # incl. future self-loops
    cur_self = {}
    for _ in range(1, levels):
        ce = defaultdict(int)
        for (a, b), w in cur.items():
            ca, cb = lab[a], lab[b]
            ce[(min(ca, cb), max(ca, cb))] += w
        for v, w in cur_self.items():
            c = lab[v]
            ce[(c, c)] += w
        wund2 = {k: w for k, w in ce.items() if k[0] != k[1]}
        wself2 = {k[0]: w for k, w in ce.items() if k[0] == k[1]}
        deg2 = defaultdict(int)
        for (a, b), w in wund2.items():
            deg2[a] += w
            deg2[b] += w
        for v, w in wself2.items():
            deg2[v] += 2 * w
        for c in set(lab.values()):
            deg2.setdefault(c, 0)
        lab_up = _replica_weighted_rounds(wund2, dict(deg2), m, rounds_per_level)
        lab = {v: lab_up[c] for v, c in lab.items()}
        cur, cur_self = wund2, wself2
    return lab


def _run(spark, edges, rounds, parts=4):
    g = Graph.from_pandas(spark, edges, num_partitions=parts)
    got = {
        r["id"]: r["community"]
        for r in louvain_moves(g, rounds=rounds).collect()
    }
    assert got == _replica(edges, rounds)


def test_louvain_kite_tail(spark):
    edges = [(1, 2), (1, 3), (1, 4), (2, 4), (3, 4), (4, 5)]
    for rounds in (1, 2, 3):
        _run(spark, edges, rounds)


def test_louvain_two_cliques_bridge(spark):
    # two triangles joined by one bridge edge: moves should pull each
    # triangle into one community
    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    _run(spark, edges, 2)
    g = Graph.from_pandas(spark, edges, num_partitions=4)
    lab = {
        r["id"]: r["community"]
        for r in louvain_moves(g, rounds=2).collect()
    }
    assert lab[1] == lab[2] == lab[3]
    assert lab[4] == lab[5] == lab[6]
    assert lab[1] != lab[4]


def test_community_graph_rollup(spark):
    from powergraph_spark.algorithms.louvain import community_graph

    edges = [(1, 2), (1, 3), (1, 4), (2, 4), (3, 4), (4, 5)]
    g = Graph.from_pandas(spark, edges, num_partitions=4)
    lab = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 50), (5, 50)], "id long, community long"
    )
    got = {
        (r["a"], r["b"]): r["w"] for r in community_graph(g, lab).collect()
    }
    assert got == {(10, 10): 2, (10, 50): 3, (50, 50): 1}


def test_multilevel_replica_exact(spark):
    from powergraph_spark.algorithms.louvain import louvain

    cliques = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    x = 424242
    rand = []
    for _ in range(90):
        x = (1103515245 * x + 12345) % (2**31)
        a = x % 20
        x = (1103515245 * x + 12345) % (2**31)
        b = x % 20
        if a != b:
            rand.append((a, b))
    for edges in (cliques, rand):
        for rpl in (1, 2):
            g = Graph.from_pandas(spark, edges, num_partitions=4)
            got = {
                r["id"]: r["community"]
                for r in louvain(g, rounds_per_level=rpl, levels=2).collect()
            }
            assert got == _replica_multilevel(edges, rpl, 2), (len(edges), rpl)


def test_multilevel_keeps_clique_partition(spark):
    from powergraph_spark.algorithms.louvain import louvain

    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    g = Graph.from_pandas(spark, edges, num_partitions=4)
    lab = {
        r["id"]: r["community"]
        for r in louvain(g, rounds_per_level=2, levels=2).collect()
    }
    assert lab[1] == lab[2] == lab[3]
    assert lab[4] == lab[5] == lab[6]
    assert lab[1] != lab[4]


def test_louvain_pseudorandom_and_partition_invariance(spark):
    # deterministic LCG edge list; replica-exact at several rounds and
    # identical across partitionings
    x = 1234567
    edges = []
    for _ in range(120):
        x = (1103515245 * x + 12345) % (2**31)
        a = x % 30
        x = (1103515245 * x + 12345) % (2**31)
        b = x % 30
        if a != b:
            edges.append((a, b))
    for rounds in (1, 2):
        _run(spark, edges, rounds, parts=4)
    g8 = Graph.from_pandas(spark, edges, num_partitions=8)
    got8 = {
        r["id"]: r["community"]
        for r in louvain_moves(g8, rounds=2).collect()
    }
    assert got8 == _replica(edges, 2)


def test_move_round_argmax_is_aggregate_not_window(spark):
    """r6 opt (r5 verdict item 6): the per-vertex best-community
    selection must compile to a partially-aggregated min-struct, not a
    row_number window — a window puts every candidate row of a hub in
    one task. Captured from the pre-checkpoint plan of one move round."""
    from pyspark.sql.classic.dataframe import DataFrame  # Spark 4: the
    # concrete class (patching the abstract pyspark.sql.DataFrame base
    # does not intercept instance calls)

    from powergraph_spark.algorithms.louvain import _move_rounds, _unit_inputs

    g = Graph.from_pandas(
        spark, [(0, 1), (1, 2), (0, 2), (2, 3)], num_partitions=2
    )
    plans = []
    orig = DataFrame.localCheckpoint

    def spy(self, eager=True):
        plans.append(
            self._sc._jvm.PythonSQLUtils.explainString(
                self._jdf.queryExecution(), "formatted"
            )
        )
        return orig(self, eager)

    DataFrame.localCheckpoint = spy
    try:
        wund, deg, m = _unit_inputs(g)
        _move_rounds(wund, deg, m, rounds=1)
    finally:
        DataFrame.localCheckpoint = orig
    assert plans, "move round never materialized"
    # the finalize dedup window of Graph.from_edges legitimately shows
    # up in the (uncached) edge subtree, so pin the regression guard to
    # the argmax's own signature: no row_number anywhere, and the
    # min-struct aggregate present.
    assert all("row_number" not in p for p in plans), (
        "argmax fell back to a row_number window"
    )
    assert any("min(struct" in p or "partial_min" in p or "min(" in p
               for p in plans)
