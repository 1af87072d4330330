"""Deterministic random-walk corpus generation (DeepWalk-style).

Graph-embedding pipelines (DeepWalk / node2vec, public) train sequence
models on random-walk "sentences" over the link graph — the walk
corpus is itself large-scale training data, so this generator follows
the repo's determinism discipline: every step's choice is an
md5-uniform draw on (seed, step, walk identity), identical on any
cluster size / partitioning / re-run and nibble-replayable in SQL.

Hub-safe plan (the 100 TB posture): adjacency is NEVER materialized as
per-vertex arrays (a 10^8-degree hub would blow any collect_list).
Instead edges are indexed once — pos = row_number within src ordered
by dst — and each step is two shuffle-hash joins of walk-sized rows:
walk.cur -> out-degree (to scale the draw), then (cur, idx) -> the
indexed edge table to fetch the chosen neighbor. The indexed-edge and
degree tables build once, persist, and co-partition on src; per-step
shuffle volume is O(#walks), independent of degree skew. Walks halt
absorbingly at out-degree-0 vertices.

The reference engine has no walk toolkit; this extends the engine
surface for embedding-training corpora (graft mandate), reusing the
GAS loop's materialization discipline (truncate_plan per step).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..gas import truncate_plan
from ..graph import Graph


@dataclass
class WalkResult:
    walks: DataFrame   # (start, w, path: array<long>)
    length: int
    walks_per_vertex: int


def random_walks(
    graph: Graph,
    walks_per_vertex: int = 1,
    length: int = 3,
    seed: str = "walk",
    num_partitions: int | None = None,
) -> WalkResult:
    """Generate ``walks_per_vertex`` directed random walks of up to
    ``length`` steps from every vertex. path[0] is the start vertex;
    a walk that reaches a vertex with no out-edges keeps its path
    (absorbing halt). Uniform next-step choice via the md5 draw
    floor(u * out_degree) into the dst-sorted edge index.
    """
    if length < 1 or walks_per_vertex < 1:
        raise ValueError("random_walks: length and walks_per_vertex >= 1")
    spark = graph.vertices.sparkSession
    P = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    e = graph.edges.select("src", "dst")
    # one-time index: position of each out-edge in its source's
    # dst-sorted list (one window sort per src group, ingest-time cost)
    eidx = (
        e.withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("src").orderBy("dst")
            ) - 1,
        )
        .repartition(P, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .repartition(P, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    eidx.count(), deg.count()

    ws = spark.range(walks_per_vertex).select(
        F.col("id").cast("int").alias("w")
    )
    state = graph.vertices.select(F.col("id").alias("start")).crossJoin(
        ws
    ).select(
        "start", "w",
        F.col("start").alias("cur"),
        F.array(F.col("start")).alias("path"),
    )

    for t in range(length):
        u = F.expr(
            f"CAST(conv(substring(md5(concat('{seed}:{t}:', "
            "CAST(start AS STRING), ':', CAST(w AS STRING))), 1, 8), "
            "16, 10) AS DOUBLE) / CAST(4294967296 AS DOUBLE)"
        )
        s = state.join(
            deg.selectExpr("src AS cur", "deg").hint("shuffle_hash"),
            "cur",
            "left",
        ).withColumn("__idx", F.floor(u * F.col("deg")))
        s = s.join(
            eidx.selectExpr(
                "src AS cur", "pos AS __idx", "dst AS __nxt"
            ).hint("shuffle_hash"),
            ["cur", "__idx"],
            "left",
        )
        state = truncate_plan(
            s.select(
                "start", "w",
                F.coalesce("__nxt", "cur").alias("cur"),
                F.when(
                    F.col("__nxt").isNotNull(),
                    F.concat(F.col("path"), F.array(F.col("__nxt"))),
                ).otherwise(F.col("path")).alias("path"),
            )
        )

    out = state.select("start", "w", "path")
    eidx.unpersist()
    deg.unpersist()
    return WalkResult(
        walks=out, length=length, walks_per_vertex=walks_per_vertex
    )
