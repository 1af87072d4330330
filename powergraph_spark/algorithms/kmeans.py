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
path. The reference's randomized init is replaced by two
DETERMINISTIC variants so results are reproducible at any parallelism
and SQL-oracle-checkable: "farthest" (serial kmeans++-style argmax of
best_distance, ties to the lowest id — pinned by the oracle queries)
and "parallel" (default; k-means||-style oversampled init, O(log k)
corpus passes instead of k — the scale path)."""

from __future__ import annotations

import math
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
    init_scan_rounds: int = 0  # corpus passes spent on initialization


def _min_dist_col(centers: list) -> Column:
    """min over ``centers`` of ||v - c||^2 for column ``v``."""
    return F.array_min(
        F.transform(
            _const_matrix(centers),
            lambda c: _sqdist(F.col("v"), c),
        )
    )


def _farthest_init(pts: DataFrame, k: int) -> tuple[list, int]:
    """Serial deterministic farthest-point init: first center = min-id
    point, then k-1 argmax-of-distance scans (kmeans++ family,
    kmeans_pp_initialization :396-418). Exactly reproducible, used by
    the SQL-oracle queries; k+1 corpus passes."""
    first = pts.orderBy("id").select("v").first()
    centers = [list(first["v"])]
    for _ in range(k - 1):
        best = (
            pts.select("id", "v", _min_dist_col(centers).alias("d"))
            .orderBy(F.desc("d"), F.asc("id"))
            .select("v")
            .first()
        )
        centers.append(list(best["v"]))
    return centers, 1 + (k - 1)


def _parallel_init(pts: DataFrame, k: int) -> tuple[list, int]:
    """Deterministic k-means||-style init (Bahmani et al., VLDB'12
    shape): ceil(log2(k)) oversampling passes, each pulling the
    ell = 2k points FARTHEST from the current candidate set (top-ell
    via TakeOrdered — no full sort shuffle; ties -> lowest id), then
    one weighting pass (candidate -> corpus assignment counts), then a
    DRIVER-side weighted farthest-point reduction of the ~2k*log2(k)
    candidates to k centers. Total corpus passes: 2 + ceil(log2(k)) —
    vs k+1 for the serial init, the difference between 7 scans and 129
    at k=128 on 100 TB. Deterministic at any parallelism (pure argmax
    selection, no sampling)."""
    def sq(a: list, b: list) -> float:
        return sum((x - y) ** 2 for x, y in zip(a, b))

    first = pts.orderBy("id").select("v").first()
    cand = [list(first["v"])]
    ell = 2 * k
    rounds = max(1, math.ceil(math.log2(k)))
    for _ in range(rounds):
        # pool = the 4*ell corpus points farthest from the current
        # candidate set (TakeOrdered — no full sort shuffle). Taking
        # the top-ell DIRECTLY as candidates fails: the farthest
        # points all sit on one region's edge. Instead extract up to
        # ell mutually-far candidates from the pool driver-side
        # (greedy farthest-point seeded by the distances-to-cand the
        # scan already computed), so one pass covers several far
        # regions at once.
        pool = (
            pts.select("id", "v", _min_dist_col(cand).alias("d"))
            .filter(F.col("d") > 0)
            .orderBy(F.desc("d"), F.asc("id"))
            .limit(4 * ell)
            .collect()
        )
        if not pool:
            break  # fewer distinct points than candidates requested
        pv = [list(r["v"]) for r in pool]
        pid = [int(r["id"]) for r in pool]
        pd = [float(r["d"]) for r in pool]
        for _ in range(min(ell, len(pv))):
            best = max(range(len(pv)), key=lambda i: (pd[i], -pid[i]))
            if pd[best] <= 0.0:
                break
            cand.append(pv[best])
            for i in range(len(pv)):
                d = sq(pv[i], pv[best])
                if d < pd[i]:
                    pd[i] = d

    # weight pass: how many corpus points each candidate would own
    wrows = (
        pts.select(_assign_expr(cand).alias("a"))
        .groupBy(F.col("a.cluster").alias("c"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    weights = [0.0] * len(cand)
    for r in wrows:
        weights[r["c"]] = float(r["n"])

    # driver-side weighted farthest-point: pick the heaviest candidate,
    # then repeatedly the candidate maximizing weight * dist-to-chosen
    # (ties -> lowest index). All O(k^2 log k * dim) on KB of data.
    chosen = [max(range(len(cand)), key=lambda i: (weights[i], -i))]
    mind = [sq(cand[i], cand[chosen[0]]) for i in range(len(cand))]
    while len(chosen) < k:
        scores = [
            (weights[i] * mind[i], -i)
            for i in range(len(cand))
        ]
        best = max(range(len(cand)), key=lambda i: scores[i])
        if mind[best] == 0.0:
            break  # fewer distinct candidates than k: allow short set
        chosen.append(best)
        for i in range(len(cand)):
            d = sq(cand[i], cand[best])
            if d < mind[i]:
                mind[i] = d
    centers = [cand[i] for i in chosen]
    while len(centers) < k:  # degenerate corpus: pad with duplicates
        centers.append(list(centers[-1]))
    return centers, 2 + rounds


def kmeans(
    points: DataFrame,
    k: int = 8,
    max_iterations: int = 20,
    tol: float = 1e-9,
    fixed_iterations: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: str = "parallel",
) -> KMeansResult:
    """Lloyd k-means. ``fixed_iterations`` pins the exact round count
    (oracle mode); otherwise stops when every center moves less than
    ``tol`` (squared distance) or after ``max_iterations``.

    ``init``: "parallel" (default — deterministic k-means||,
    O(log k) corpus passes, the 100 TB path) or "farthest" (serial
    k-1-scan farthest-point; exactly the variant the DuckDB oracle
    queries unroll, so oracle-mode callers pin it)."""
    pts = points.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n = pts.count()
    if n == 0:
        raise ValueError("kmeans on an empty point set")
    k = min(k, n)

    if init == "parallel":
        centers, init_rounds = _parallel_init(pts, k)
    elif init == "farthest":
        centers, init_rounds = _farthest_init(pts, k)
    else:
        raise ValueError(f"unknown kmeans init {init!r}")
    k = len(centers)

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
        init_scan_rounds=init_rounds,
    )


def cluster_sizes(result: KMeansResult) -> DataFrame:
    """(cluster, n_points) — the reference's per-cluster count
    (cluster_center_reducer carries the count alongside the sum)."""
    return (
        result.assignments.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_points"))
        .orderBy("cluster")
    )
