"""Node embeddings (walk SPPMI + truncated SVD) vs numpy replicas.
Composition of algorithms/walks.py + svd.py — see
powergraph_spark/algorithms/embeddings.py for the public sources."""

from __future__ import annotations

import hashlib
import math

import numpy as np
from pyspark.sql import Row

from powergraph_spark.algorithms.embeddings import (
    node_embeddings,
    sppmi,
    walk_cooccurrence,
)
from powergraph_spark.graph import Graph


def _u(t, start, seed="emb"):
    h = hashlib.md5(f"{seed}:{t}:{start}:0".encode()).hexdigest()[:8]
    return int(h, 16) / 4294967296.0


def _py_walks(edges, vertices, length, seed="emb"):
    """Replica of random_walks at walks_per_vertex=1: dst-sorted
    uniform index step, absorbing dead ends."""
    out_sorted = {}
    for s, d in edges:
        out_sorted.setdefault(s, []).append(d)
    for s in out_sorted:
        out_sorted[s].sort()
    walks = {}
    for v in sorted(vertices):
        path, cur = [v], v
        for t in range(length):
            nbrs = out_sorted.get(cur)
            if nbrs:
                cur = nbrs[int(_u(t, v, seed) * len(nbrs))]
                path.append(cur)
        walks[v] = path
    return walks


def _py_cooc(walks, window):
    cooc = {}
    for path in walks.values():
        n = len(path)
        for i in range(n):
            for j in range(max(0, i - window), min(n, i + window + 1)):
                if j != i:
                    k = (path[i], path[j])
                    cooc[k] = cooc.get(k, 0.0) + 1.0
    return cooc


def _py_sppmi(cooc, shift=1.0):
    total = sum(cooc.values())
    row, col = {}, {}
    for (a, b), c in cooc.items():
        row[a] = row.get(a, 0.0) + c
        col[b] = col.get(b, 0.0) + c
    out = {}
    for (a, b), c in cooc.items():
        v = math.log(c * total / (row[a] * col[b])) - math.log(shift)
        if v > 0:
            out[(a, b)] = v
    return out


def _ring_graph(spark, n=14):
    edges = [(i, (i + 1) % n) for i in range(n)]
    edges += [(i, (i + 3) % n) for i in range(n)]
    df = spark.createDataFrame(
        [Row(src=s, dst=d) for s, d in edges]
    )
    return Graph.from_edges(df, num_partitions=4), edges, set(range(n))


def test_cooc_and_sppmi_match_python(spark):
    from powergraph_spark.algorithms import random_walks

    g, edges, verts = _ring_graph(spark)
    wk = random_walks(g, walks_per_vertex=1, length=3, seed="emb")
    got_cooc = {
        (r["a"], r["b"]): r["cnt"]
        for r in walk_cooccurrence(wk.walks, window=2).collect()
    }
    pw = _py_walks(edges, verts, 3, "emb")
    exp_cooc = _py_cooc(pw, 2)
    assert got_cooc == exp_cooc

    got = {
        (r["a"], r["b"]): r["val"]
        for r in sppmi(
            walk_cooccurrence(wk.walks, window=2)
        ).collect()
    }
    exp = _py_sppmi(exp_cooc)
    assert set(got) == set(exp)
    assert all(abs(got[k] - exp[k]) < 1e-9 for k in exp)


def test_node_embeddings_match_dense_svd(spark):
    """k=1 against the exact dense SVD: the ring fixture's top
    singular value is well-gapped (sigma1/sigma2 ~ 0.69 per power
    step), so 30 block-power iterations pin it to ~1e-9. (k=2 on this
    fixture is NOT separable — sigma2/sigma3 = 0.956 — which is a
    property of the spectrum, not the engine; the k=2 path is covered
    by the parallelism-invariance test below.)"""
    g, edges, verts = _ring_graph(spark)
    res = node_embeddings(
        g, k=1, window=2, walk_length=3, svd_iterations=30, seed="emb"
    )
    vecs = {r["id"]: np.array(r["vector"]) for r in res.vectors.collect()}

    # dense replica: SPPMI matrix -> exact numpy SVD -> U_1 sqrt(S_1)
    pw = _py_walks(edges, verts, 3, "emb")
    m = _py_sppmi(_py_cooc(pw, 2))
    ids = sorted(verts)
    pos = {v: i for i, v in enumerate(ids)}
    M = np.zeros((len(ids), len(ids)))
    for (a, b), v in m.items():
        M[pos[a], pos[b]] = v
    U, S, Vt = np.linalg.svd(M)
    assert abs(res.singular_values[0] - S[0]) < 1e-8 * S[0]
    W = U[:, 0] * np.sqrt(S[0])
    got = np.array([vecs[v][0] for v in ids])
    # singular vectors are sign-ambiguous: compare up to sign
    c = np.dot(got, W) / (np.linalg.norm(got) * np.linalg.norm(W))
    assert abs(abs(c) - 1.0) < 1e-9
    assert np.allclose(np.abs(got), np.abs(W), atol=1e-7)
    assert res.n_entries == len(m)


def test_embeddings_parallelism_invariance(spark):
    g1, _, _ = _ring_graph(spark)
    df = g1.edges.select("src", "dst")
    g2 = Graph.from_edges(df.repartition(16), num_partitions=16)
    a = node_embeddings(g1, k=2, svd_iterations=10, seed="emb")
    b = node_embeddings(g2, k=2, svd_iterations=10, seed="emb")
    va = {r["id"]: tuple(round(x, 9) for x in r["vector"])
          for r in a.vectors.collect()}
    vb = {r["id"]: tuple(round(x, 9) for x in r["vector"])
          for r in b.vectors.collect()}
    assert va == vb
