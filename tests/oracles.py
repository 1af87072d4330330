"""Pure-Python / numpy oracles for the flagship algorithms.

Each oracle implements the REFERENCE semantics exactly (not textbook
variants) — see citations. Used by pytest to gate the Spark engine:
PageRank allclose 1e-6; CC/LP exact; triangles exact (BASELINE.json).
"""

from __future__ import annotations

from collections import Counter, defaultdict


def pagerank_oracle(
    edges: list[tuple[int, int]],
    vertices: set[int],
    tol: float = 1e-6,
    max_iter: int = 200,
    damping: float = 0.85,
) -> dict[int, float]:
    """Unnormalized PowerGraph PageRank: r=1 init; r' = 0.15 + 0.85 *
    sum(r_u/outdeg_u over in-neighbors); no dangling redistribution
    (/root/reference/toolkits/graph_analytics/pagerank.cpp:52,99-106).
    Runs synchronous full updates until max|delta| <= tol.
    """
    out_deg: Counter = Counter()
    in_nbrs: dict[int, list[int]] = defaultdict(list)
    for s, d in edges:
        out_deg[s] += 1
        in_nbrs[d].append(s)
    rank = {v: 1.0 for v in vertices}
    for _ in range(max_iter):
        new = {}
        for v in vertices:
            s = sum(rank[u] / out_deg[u] for u in in_nbrs.get(v, ()))
            new[v] = 0.15 + damping * s
        delta = max(abs(new[v] - rank[v]) for v in vertices)
        rank = new
        if delta <= tol:
            break
    return rank


def cc_oracle(edges: list[tuple[int, int]], vertices: set[int]) -> dict[int, int]:
    """Min-label connected components (undirected), exact
    (/root/reference/toolkits/graph_analytics/connected_component.cpp:105-113):
    component id = min vertex id in the component. Union-find."""
    parent = {v: v for v in vertices}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    # path-compress to min id per component
    comp_min: dict[int, int] = {}
    for v in vertices:
        r = find(v)
        comp_min[r] = min(comp_min.get(r, r), v)
    return {v: comp_min[find(v)] for v in vertices}


def lp_oracle(
    edges: list[tuple[int, int]],
    vertices: set[int],
    labels: dict[int, int] | None = None,
    max_iter: int = 100,
) -> dict[int, int]:
    """Synchronous label propagation, reference semantics
    (/root/reference/apps/label_propagation/label_propagation.cpp:101-125):
    gather over ALL edges (in-list + out-list — reciprocal edges count
    the neighbor twice); argmax neighbor-label count with strict > over
    ascending label order => ties go to the SMALLEST label; edgeless
    vertices keep their label; stop when nothing changes.
    """
    nbrs: dict[int, list[int]] = defaultdict(list)
    for s, d in edges:
        nbrs[s].append(d)
        nbrs[d].append(s)
    lab = {v: (labels[v] if labels else v) for v in vertices}
    for _ in range(max_iter):
        new = {}
        changed = False
        for v in vertices:
            if not nbrs.get(v):
                new[v] = lab[v]
                continue
            cnt: Counter = Counter(lab[u] for u in nbrs[v])
            best_label, best_count = lab[v], 0
            for label in sorted(cnt):  # ascending ~ std::map order
                if cnt[label] > best_count:
                    best_count = cnt[label]
                    best_label = label
            new[v] = best_label
            changed |= best_label != lab[v]
        lab = new
        if not changed:
            break
    return lab


def triangles_oracle(
    edges: list[tuple[int, int]], vertices: set[int]
) -> tuple[dict[int, int], int]:
    """Brute-force undirected triangle count: per-vertex counts + total
    (/root/reference/toolkits/graph_analytics/
    simple_undirected_triangle_count.cpp:118-288)."""
    und = set()
    for s, d in edges:
        if s != d:
            und.add((min(s, d), max(s, d)))
    adj: dict[int, set[int]] = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    per_v = {v: 0 for v in vertices}
    total = 0
    vs = sorted(vertices)
    for a, b in sorted(und):
        for w in adj[a] & adj[b]:
            if w > b:  # each triangle once: a < b < w
                total += 1
                per_v[a] += 1
                per_v[b] += 1
                per_v[w] += 1
    return per_v, total


def sssp_oracle(
    edges: list[tuple[int, int, float]], vertices: set[int], source: int
) -> dict[int, float]:
    """Dijkstra over directed weighted edges
    (/root/reference/toolkits/graph_analytics/sssp.cpp:96-165; the
    reference treats the graph as directed unless --directed=0, we do
    directed). Unreachable => +inf (reference leaves max dist)."""
    import heapq

    adj: dict[int, list[tuple[int, float]]] = defaultdict(list)
    for s, d, w in edges:
        adj[s].append((d, w))
    dist = {v: float("inf") for v in vertices}
    dist[source] = 0.0
    pq = [(0.0, source)]
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist[u]:
            continue
        for v, w in adj.get(u, ()):
            nd = du + w
            if nd < dist[v]:
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def powerlaw_edges(
    nverts: int, seed: int = 42, alpha: float = 2.1, max_out: int = 100
) -> list[tuple[int, int]]:
    """Deterministic synthetic power-law graph in the spirit of the
    reference's load_synthetic_powerlaw (out-degree ~ d^-alpha via
    multinomial CDF, fixed-stride target walk skipping self-loops,
    /root/reference/src/graphlab/graph/distributed_graph.hpp:2380-2412).
    Reimplemented from the published idea, not the code."""
    import random

    rng = random.Random(seed)
    # CDF over out-degrees 1..max_out with P(d) ~ d^-alpha
    weights = [d ** -alpha for d in range(1, max_out + 1)]
    tot = sum(weights)
    cdf = []
    acc = 0.0
    for w in weights:
        acc += w / tot
        cdf.append(acc)
    stride = 2654435761 % nverts or 1
    edges = set()
    for v in range(nverts):
        r = rng.random()
        deg = next(i + 1 for i, c in enumerate(cdf) if r <= c)
        t = (v * 7919 + 13) % nverts
        while deg > 0:
            if t != v:
                edges.add((v, t))
                deg -= 1
            t = (t + stride) % nverts
    return sorted(edges)
