"""K-means clustering (Lloyd iterations) over vector columns.

Reference: /root/reference/toolkits/clustering/kmeans.cpp
- per-point squared-euclidean assignment to the nearest of NUM_CLUSTERS
  centers (sqr_distance :113-125, cluster_assignment apply loop
  :640-652), tracking (best_cluster, best_distance);
- center update = per-cluster mean of member points
  (cluster_center_reducer map/+= :300-340);
- iterate until no assignment changes or max iterations;
- kmeans++-style initialization seeds centers far apart
  (kmeans_pp_initialization :396-418, random_sample_reducer :422-460).

Spark mapping: centers are DRIVER-side state (k x dim doubles — KB,
the one genuinely-global tiny object in the algorithm), shipped into
the plan per iteration as ONE constant nested array
(datapipe.similarity._const_matrix — no per-element literal blowup).
Assignment is a pure JVM expression (argmin over a (dist, idx) struct
sort — tie-break lowest cluster index, deterministic); the center
update is posexplode -> groupBy(cluster, pos).avg — Spark's partial
hash agg collapses the dim-wide explosion to P*k*dim partial rows, so
shuffle volume is independent of |points|. No Python in any per-row
path. The reference's randomized init is replaced by the
DETERMINISTIC farthest-point variant of kmeans++ (argmax of
best_distance, ties to the lowest id) so results are reproducible at
any parallelism and SQL-oracle-checkable.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..datapipe.similarity import _const_matrix, _dot


def _sqdist(v: Column, c: Column) -> Column:
    """||v - c||^2 = v.v - 2 v.c + c.c — the exact formula the DuckDB
    oracle uses (list_dot_product composition), so both engines walk
    the same float path."""
    return _dot(v, v) - 2 * _dot(v, c) + _dot(c, c)


def _assign_expr(centers: list) -> Column:
    """struct(d, cluster) of the nearest center for column ``v``."""
    C = _const_matrix(centers)
    IDX = F.expr(
        "array(" + ",".join(str(i) for i in range(len(centers))) + ")"
    )
    pairs = F.zip_with(
        C, IDX,
        lambda c, i: F.struct(
            _sqdist(F.col("v"), c).alias("d"), i.alias("cluster")
        ),
    )
    return F.element_at(F.array_sort(pairs), 1)


@dataclass
class KMeansResult:
    assignments: DataFrame  # (id, cluster, sqdist)
    centers: list[list[float]]
    iterations: int
    converged: bool


def kmeans(
    points: DataFrame,
    k: int = 8,
    max_iterations: int = 20,
    tol: float = 1e-9,
    fixed_iterations: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> KMeansResult:
    """Lloyd k-means. ``fixed_iterations`` pins the exact round count
    (oracle mode); otherwise stops when every center moves less than
    ``tol`` (squared distance) or after ``max_iterations``."""
    pts = points.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n = pts.count()
    if n == 0:
        raise ValueError("kmeans on an empty point set")
    k = min(k, n)

    # deterministic farthest-point init (kmeans++ family,
    # kmeans_pp_initialization :396-418): first center = min-id point,
    # then argmax of distance-to-nearest-chosen (ties -> lowest id)
    first = pts.orderBy("id").select("v").first()
    centers = [list(first["v"])]
    for _ in range(k - 1):
        best = (
            pts.select(
                "id", "v",
                F.array_min(
                    F.transform(
                        _const_matrix(centers),
                        lambda c: _sqdist(F.col("v"), c),
                    )
                ).alias("d"),
            )
            .orderBy(F.desc("d"), F.asc("id"))
            .select("v")
            .first()
        )
        centers.append(list(best["v"]))

    dim = len(centers[0])
    n_rounds = fixed_iterations or max_iterations
    converged = False
    it = 0
    assigned = None
    for it in range(1, n_rounds + 1):
        assigned = pts.select(
            "id", "v", _assign_expr(centers).alias("a")
        ).select(
            "id", "v",
            F.col("a.cluster").alias("cluster"),
            F.col("a.d").alias("sqdist"),
        )
        # per-cluster per-dimension mean; partial agg collapses the
        # posexplode to P*k*dim rows before the shuffle
        rows = (
            assigned.select("cluster", F.posexplode("v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        new_centers = [list(c) for c in centers]  # empty cluster: keep
        got = {}
        for r in rows:
            got.setdefault(r["cluster"], [0.0] * dim)[r["pos"]] = r["m"]
        for c, vec in got.items():
            new_centers[c] = vec
        moved = max(
            sum((a - b) ** 2 for a, b in zip(old, new))
            for old, new in zip(centers, new_centers)
        )
        centers = new_centers
        if fixed_iterations is None and moved <= tol:
            converged = True
            break

    # final assignment against the converged centers
    assignments = pts.select(
        "id", _assign_expr(centers).alias("a")
    ).select(
        "id",
        F.col("a.cluster").alias("cluster"),
        F.col("a.d").alias("sqdist"),
    )
    pts.unpersist()
    return KMeansResult(
        assignments=assignments,
        centers=centers,
        iterations=it,
        converged=converged,
    )


def cluster_sizes(result: KMeansResult) -> DataFrame:
    """(cluster, n_points) — the reference's per-cluster count
    (cluster_center_reducer carries the count alongside the sum)."""
    return (
        result.assignments.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_points"))
        .orderBy("cluster")
    )
