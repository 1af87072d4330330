"""SemDeDup-style semantic deduplication over an embedding column.

Method (public knowledge: Abbas et al., "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication",
arXiv:2303.09540): k-means-cluster the embedding space so that
near-duplicate candidates are confined to single clusters, then
compare cosine similarity ONLY within a cluster and keep one
representative per set of semantic near-duplicates.

The reference engine has no semantic-dedup toolkit; this extends the
repo's dedup family (exact -> MinHash -> SimHash -> embedding buckets,
SURVEY.md section 2.9) with the clustering-routed variant, reusing
`algorithms.kmeans` (toolkits/clustering/kmeans.cpp parity) for the
routing step.

Deterministic keep rule (join-expressible, no iteration): drop x iff
some y in the SAME cluster has cosine(x, y) >= threshold and
(y.sqdist, y.id) < (x.sqdist, x.id), where sqdist is the squared
distance to the cluster centroid. Among any similar pair, the member
closer to its centroid survives; ties break to the lower id. (The
paper keeps one representative per component of the within-cluster
similarity graph; the dominance rule reproduces that dedup behavior
without an iterative connected-components pass and is exactly
expressible in one SQL join, so the DuckDB oracle can replay it
bit-for-bit. For transitive chains x~y~z where x!~z, dominance may
drop both x and z in favor of y, the centroid-nearest member — the
stricter of the two readings.)

Scale posture (100 TB): the only pairwise work is the cluster-local
self-join — choose k so |cluster| ~= corpus/k stays bounded (SemDeDup
uses k = 50,000 on LAION); everything shuffles once, hash-partitioned
by cluster, as (id, vector) rows. Cosine and dominance are pure JVM
expressions (zip_with/aggregate folds); no Python in any per-row
path. The k-means routing itself is the repo's kmeans (driver-side
centers as one constant literal, O(log k)-pass parallel init).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import cosine


def semantic_dedup(
    points: DataFrame,
    k: int = 8,
    threshold: float = 0.7,
    kmeans_rounds: int = 3,
    init: str = "parallel",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster-routed semantic dedup. Returns one row per input point:
    ``(id, cluster, sqdist, keep)`` where ``keep`` is False iff the
    point is dominated by a same-cluster near-duplicate (cosine >=
    ``threshold``) that sits closer to the shared centroid (ties to
    the lower id). ``init="farthest"`` pins the serial deterministic
    init the SQL oracle unrolls; "parallel" (default) is the
    O(log k)-pass scale path."""
    # deferred: algorithms.kmeans itself imports datapipe.similarity,
    # so a module-level import here would be circular
    from ..algorithms.kmeans import kmeans

    res = kmeans(
        points, k=k, fixed_iterations=kmeans_rounds, init=init,
        id_col=id_col, vec_col=vec_col,
    )
    pts = points.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    base = res.assignments.join(pts, "id")  # id, cluster, sqdist, v

    a = base
    b = base.select(
        F.col("id").alias("id2"),
        F.col("cluster").alias("cluster2"),
        F.col("sqdist").alias("sqdist2"),
        F.col("v").alias("v2"),
    )
    # Dominance is strict on (sqdist, id), so x never dominates itself
    # and exactly one member of any similar pair survives it.
    dominated = (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("cluster") == F.col("cluster2"))
            & (
                (F.col("sqdist2") < F.col("sqdist"))
                | (
                    (F.col("sqdist2") == F.col("sqdist"))
                    & (F.col("id2") < F.col("id"))
                )
            )
            & (cosine(F.col("v"), F.col("v2")) >= F.lit(threshold)),
        )
        .select("id")
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    return (
        base.join(dominated.hint("shuffle_hash"), "id", "left")
        .select(
            "id",
            "cluster",
            "sqdist",
            F.coalesce(~F.col("_dropped"), F.lit(True)).alias("keep"),
        )
    )


def semantic_dedup_kept(
    points: DataFrame,
    k: int = 8,
    threshold: float = 0.7,
    kmeans_rounds: int = 3,
    init: str = "parallel",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Convenience: the surviving original rows (all input columns)."""
    flags = semantic_dedup(
        points, k=k, threshold=threshold, kmeans_rounds=kmeans_rounds,
        init=init, id_col=id_col, vec_col=vec_col,
    ).filter("keep").select(F.col("id").alias("__keep_id"))
    return (
        points.join(
            flags.hint("shuffle_hash"),
            points[id_col].cast("long") == F.col("__keep_id"),
        )
        .drop("__keep_id")
    )
