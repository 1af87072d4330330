"""Truncated SVD of the bipartite rating/adjacency matrix.

Reference: /root/reference/toolkits/collaborative_filtering/svd.cpp —
one-sided Lanczos over the bipartite graph (init_lanczos :310-352,
lanczos loop :354-437: repeated distributed mat-vec A/Aᵀ products with
driver-side re-orthogonalization against prior basis vectors, then an
SVD of the small bidiagonal matrix). nsv singular triplets of the
user x item matrix whose entries are the edge ratings.

Spark mapping: ALTERNATING BLOCK POWER ITERATION — the
convergence-equivalent subspace method with the same building blocks
(distributed tall-skinny mat-vec + tiny driver-side linear algebra)
but no sequential per-vector Lanczos recurrence, so every superstep is
the engine's standard scatter-join + segmented aggregation:

    U_raw = A V        (join edges with item block, element-scale by
                        rating, per-user element-wise sum)
    U     = U_raw R⁻¹   (Gram = Σ row outer-products -> k x k on the
                        driver -> Cholesky -> apply R⁻¹ as one
                        constant-matrix projection, JVM-side)
    V_raw = Aᵀ U; V = V_raw R⁻¹   (same, other side)

diag(R) of the final V-step converges to the singular values; U/V
columns to the singular vectors. All distributed steps shuffle only
(id, k-vector) rows; the k x k Gram rides one partial-agg job. The
driver-side objects are k x k — the same "tiny global" split as the
reference's Lanczos coefficients.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..datapipe.similarity import _const_matrix
from ..gas import truncate_plan
from ..graph import Graph
from .als import SAFE_NEG_OFFSET, _array_sum, _hash_init_expr


def _gram(vecs: DataFrame, k: int):
    """k x k Gram matrix of the (id, arr) block — flattened row outer
    products through ONE partial-agg sum, collected to the driver."""
    import numpy as np

    outer = F.flatten(
        F.transform(
            "arr",
            lambda x: F.transform("arr", lambda y: x * y),
        )
    )
    row = (
        vecs.select(F.posexplode(outer).alias("pos", "val"))
        .groupBy("pos")
        .agg(F.sum("val").alias("s"))
        .collect()
    )
    g = np.zeros(k * k)
    for r in row:
        g[r["pos"]] = r["s"]
    return g.reshape(k, k)


def _chol_r(g, k: int):
    """(R, diag_sigma) with g = Rᵀ R. Happy path: Cholesky on
    g + 1e-12·I (the exact expression the svd_k1 oracle mirrors).
    A rank-deficient block with a large-norm Gram can carry float
    error above the absolute ridge and make Cholesky raise — degrade
    gracefully via eigh: R = diag(√w⁺)·Qᵀ (eigenvalues clamped to the
    ridge, sorted descending) still satisfies RᵀR = g on the PSD
    projection, keeps R invertible, and its singular-value estimate
    is √w rather than diag(R)."""
    import numpy as np

    try:
        R = np.linalg.cholesky(g + 1e-12 * np.eye(k)).T
        return R, [float(R[j][j]) for j in range(k)]
    except np.linalg.LinAlgError:
        w, Q = np.linalg.eigh(g)
        order = np.argsort(w)[::-1]
        w = np.maximum(w[order], 1e-12)
        R = np.sqrt(w)[:, None] * Q[:, order].T
        return R, [float(x) for x in np.sqrt(w)]


def _apply_rinv(vecs: DataFrame, rinv, k: int) -> DataFrame:
    """(id, arr) -> (id, arr @ R⁻¹): one constant k x k matrix, each
    output element a JVM dot product against a column of R⁻¹."""
    cols = [[float(rinv[m][j]) for m in range(k)] for j in range(k)]
    C = _const_matrix(cols)  # row j of C = column j of R⁻¹
    return vecs.select(
        "id",
        F.transform(
            C,
            lambda col: F.aggregate(
                F.zip_with("arr", col, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        ).alias("arr"),
    )


@dataclass
class SVDResult:
    user_vectors: DataFrame   # (id, arr k) — left singular vectors
    item_vectors: DataFrame   # (id, arr k) — right singular vectors
    singular_values: list[float]
    iterations: int


def svd(
    graph: Graph,
    k: int = 4,
    iterations: int = 15,
    init_expr: str | None = None,
) -> SVDResult:
    """Top-k singular triplets of the ratings_graph matrix (entry
    (u, i) = edge rating; missing entries are 0). Deterministic hash
    init; fixed iteration count (subspace iteration converges
    geometrically in sigma_{k+1}/sigma_k)."""
    import numpy as np

    P = graph.num_partitions
    edges = graph.edges.select("src", "dst", "rating").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    edges.count()
    users = edges.select(F.col("src").alias("id")).distinct()
    items = edges.select(F.col("dst").alias("id")).distinct()

    V = items.selectExpr(
        "id", f"({init_expr or _hash_init_expr(k)}) AS arr"
    ).repartition(P, "id").persist(StorageLevel.MEMORY_AND_DISK)
    V.count()

    def matvec(block: DataFrame, key: str, other: str) -> DataFrame:
        j = edges.join(
            block.selectExpr(f"id AS {other}", "arr AS _b"), other
        ).select(
            key,
            F.transform("_b", lambda x: x * F.col("rating")).alias("c"),
        )
        return _array_sum(j, key, "c").select("id", F.col("grad").alias("arr"))

    sigma = [0.0] * k
    U = None
    it = 0
    for it in range(1, iterations + 1):
        U_raw = matvec(V, "src", "dst")
        R, _ = _chol_r(_gram(U_raw, k), k)  # g = Rᵀ R
        new_U = truncate_plan(_apply_rinv(U_raw, np.linalg.inv(R), k))
        if U is not None:
            U.unpersist()
        U = new_U

        V_raw = matvec(U, "dst", "src")
        R, sigma = _chol_r(_gram(V_raw, k), k)
        new_V = truncate_plan(_apply_rinv(V_raw, np.linalg.inv(R), k))
        V.unpersist()
        V = new_V

    user_vectors = users.join(U, "id", "left").select(
        "id",
        F.coalesce(
            "arr", F.array(*[F.lit(0.0) for _ in range(k)])
        ).alias("arr"),
    )
    item_vectors = items.join(V, "id", "left").select(
        (-F.col("id") - F.lit(SAFE_NEG_OFFSET)).alias("id"),
        F.coalesce(
            "arr", F.array(*[F.lit(0.0) for _ in range(k)])
        ).alias("arr"),
    )
    edges.unpersist()
    return SVDResult(
        user_vectors=user_vectors,
        item_vectors=item_vectors,
        singular_values=sigma,
        iterations=it,
    )
