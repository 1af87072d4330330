"""Spectral clustering: normalized Laplacian -> k-dim spectral
embedding -> k-means on the embedding rows.

Reference: /root/reference/toolkits/clustering/spectral_clustering.cpp —
the workflow driver that shells graph_laplacian (:37-47), an SVD of the
Laplacian for the smallest eigenvectors (:49-107, via the Lanczos
solver), eigen_vector_normalization, and kmeans over the eigenvector
rows (:109-146). This module is the same composition in-process, on
the repo's own toolkits.

Spark mapping. The k smallest eigenvectors of the normalized Laplacian
L = I - D^-1/2 W D^-1/2 are the k LARGEST of M = I + D^-1/2 W D^-1/2
(spectrum of M is 2 - spec(L), in [0, 2]), so the "smallest
eigenvectors" solve is a BLOCK POWER ITERATION on M — the svd.py
machinery pointed at the spectral end the reference reaches via shift:
every superstep is one distributed COO mat-vec (scatter join +
element-wise array sum, only (id, k-vector) rows shuffle) followed by a
k x k Gram -> Cholesky -> R^-1 projection. The Cholesky and the
triangular inverse are PURE-PYTHON back-substitution (k is tiny) with a
fixed operation order, so the unrolled DuckDB oracle can replay the
identical float path scalar by scalar.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..gas import truncate_plan
from ..graph import Graph
from .als import _array_sum, _hash_init_expr
from .kmeans import KMeansResult, kmeans
from .laplacian import graph_laplacian
from .svd import _apply_rinv, _gram


def normalized_adjacency(
    graph: Graph, weight_col: str | None = None
) -> DataFrame:
    """(i, j, value) COO rows of D^-1/2 W D^-1/2 (both directions) —
    the off-diagonal block of the normalized-cut Laplacian writer
    (graph_laplacian.cpp:95-131,182-202)."""
    return graph_laplacian(
        graph, weight_col=weight_col, mode="normalized_cut"
    ).filter(F.col("i") != F.col("j"))


def _chol_upper(g: list[list[float]], k: int, ridge: float = 1e-12):
    """Upper-triangular R with RᵀR = g + ridge·I, classic column-order
    Cholesky in pure python (fixed IEEE operation order — the DuckDB
    oracle mirrors these exact expressions)."""
    r = [[0.0] * k for _ in range(k)]
    for j in range(k):
        s = g[j][j] + ridge
        for m in range(j):
            s -= r[m][j] * r[m][j]
        r[j][j] = math.sqrt(s)
        for i in range(j + 1, k):
            t = g[j][i]
            for m in range(j):
                t -= r[m][j] * r[m][i]
            r[j][i] = t / r[j][j]
    return r


def _tri_inv(r: list[list[float]], k: int):
    """Inverse of upper-triangular R by back-substitution (same fixed
    operation order contract as _chol_upper)."""
    inv = [[0.0] * k for _ in range(k)]
    for j in range(k):
        inv[j][j] = 1.0 / r[j][j]
        for i in range(j - 1, -1, -1):
            s = 0.0
            for m in range(i + 1, j + 1):
                s += r[i][m] * inv[m][j]
            inv[i][j] = -s / r[i][i]
    return inv


def spectral_embedding(
    graph: Graph,
    k: int = 2,
    iterations: int = 10,
    weight_col: str | None = None,
    init_expr: str | None = None,
    ridge: float = 1e-12,
) -> DataFrame:
    """(id, arr[k]): orthonormal basis of the dominant k-subspace of
    M = I + D^-1/2 W D^-1/2 == the k smallest eigenvectors of the
    normalized Laplacian (the reference's Lanczos target). Fixed
    iteration count; deterministic init (hash by default, or an
    explicit portable ``init_expr`` for oracle replay)."""
    P = graph.num_partitions
    coo = normalized_adjacency(graph, weight_col).repartition(
        P, "j"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    coo.count()

    x = graph.vertices.selectExpr(
        "id", f"({init_expr or _hash_init_expr(k)}) AS arr"
    ).repartition(P, "id").localCheckpoint(eager=True)  # init: single consumer

    for _ in range(iterations):
        # y = x + A x : COO mat-vec (scatter join on the source side,
        # element-wise array partial agg), then the identity add
        contrib = coo.join(
            x.selectExpr("id AS j", "arr AS xa").hint("shuffle_hash"), "j"
        ).select(
            F.col("i").alias("vid"),
            F.transform("xa", lambda e: e * F.col("value")).alias("c"),
        )
        ax = _array_sum(contrib, "vid", "c").select(
            "id", F.col("grad").alias("ax")
        )
        y = (
            x.join(ax.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                F.when(
                    F.col("ax").isNull(), F.col("arr")
                ).otherwise(
                    F.zip_with("arr", "ax", lambda a, b: a + b)
                ).alias("arr"),
            )
        )
        g = [[float(v) for v in row] for row in _gram(y, k)]
        rinv = _tri_inv(_chol_upper(g, k, ridge), k)
        x = truncate_plan(_apply_rinv(y, rinv, k))

    coo.unpersist()
    return x


@dataclass
class SpectralResult:
    embedding: DataFrame          # (id, arr[k_dim])
    kmeans: KMeansResult
    assignments: DataFrame        # (id, cluster)


def spectral_clustering(
    graph: Graph,
    k: int = 2,
    embedding_dim: int | None = None,
    power_iterations: int = 10,
    kmeans_rounds: int | None = None,
    weight_col: str | None = None,
    init_expr: str | None = None,
    kmeans_init: str = "farthest",
) -> SpectralResult:
    """The reference workflow end to end: spectral embedding (k
    smallest Laplacian eigenvectors) -> Lloyd k-means over the
    embedding rows (spectral_clustering.cpp:109-146). ``kmeans_rounds``
    pins the exact round count (oracle mode); default runs k-means to
    its own convergence. ``kmeans_init`` defaults to the serial
    "farthest" variant the SQL oracle unrolls; pass "parallel" for the
    O(log k)-scan k-means|| init on large embeddings."""
    dim = embedding_dim or k
    emb = spectral_embedding(
        graph, k=dim, iterations=power_iterations,
        weight_col=weight_col, init_expr=init_expr,
    )
    km = kmeans(
        emb, k=k, fixed_iterations=kmeans_rounds,
        id_col="id", vec_col="arr", init=kmeans_init,
    )
    return SpectralResult(
        embedding=emb,
        kmeans=km,
        assignments=km.assignments.select("id", "cluster"),
    )
