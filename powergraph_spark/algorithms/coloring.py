"""Greedy graph coloring (Jones-Plassmann style).

Reference: /root/reference/toolkits/graph_analytics/simple_coloring.cpp
:49-158 — gather the neighbor color set, apply the minimum free color;
the reference runs this on the ASYNC engine with edge consistency
because synchronous parallel recoloring oscillates. Spark is BSP, so we
use the Jones-Plassmann independent-set schedule, the standard
synchronous-parallel formulation of the same greedy: each round, every
uncolored vertex whose random priority beats all uncolored neighbors
takes the minimum color unused by its colored neighbors. Same
capability contract — a valid coloring (validated like the reference's
zero-conflict check via map_reduce_edges, simple_coloring.cpp:262) —
with deterministic results (hash priorities).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..graph import Graph


def coloring(graph: Graph, max_iterations: int = 200, verbose: bool = False) -> DataFrame:
    """Returns (id, color int). Deterministic: priority = xxhash64(id)."""
    P = graph.num_partitions
    sym = graph.symmetrized_edges().repartition(P, "src").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sym.count()
    # co-partition state with the gather joins (hash by id == the join
    # key); filters below preserve the partitioning, so the hinted
    # shuffle-hash joins run with zero exchange on the state side —
    # the same discipline as pagerank.py (AQE otherwise broadcasts the
    # |V|-row uncolored set every wave).
    state = graph.vertices.select(
        "id", F.lit(None).cast("int").alias("color"),
        F.xxhash64("id").alias("prio"),
    ).repartition(P, "id").persist(StorageLevel.MEMORY_AND_DISK)

    for it in range(max_iterations):
        uncolored = state.filter(F.col("color").isNull())
        if uncolored.isEmpty():
            break
        # winners: uncolored vertices beating all uncolored neighbors
        nbr_prio = (
            sym.join(
                uncolored.select(F.col("id").alias("src"),
                                 F.col("prio").alias("nprio"))
                .hint("shuffle_hash"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.max(F.struct("nprio", F.col("src").alias("nid"))).alias("mx"))
            .select("id", F.col("mx.nprio").alias("max_nprio"),
                    F.col("mx.nid").alias("max_nid"))
        )
        winners = (
            uncolored.join(nbr_prio, "id", "left")
            .filter(
                F.col("max_nprio").isNull()
                | (F.struct("prio", "id")
                   > F.struct(F.col("max_nprio").alias("prio"),
                              F.col("max_nid").alias("id")))
            )
            .select(F.col("id").alias("wid"))
        )
        # min free color among already-colored neighbors
        used = (
            sym.join(
                state.filter(F.col("color").isNotNull())
                .select(F.col("id").alias("src"), F.col("color").alias("nc"))
                .hint("shuffle_hash"),
                "src")
            .join(winners, sym.dst == F.col("wid"))
            .groupBy("wid")
            .agg(F.collect_set("nc").alias("used"))
        ).withColumnRenamed("wid", "id")
        winners = winners.withColumnRenamed("wid", "id")
        free = F.coalesce(
            F.element_at(
                F.filter(
                    F.sequence(F.lit(0), F.size("used")),
                    lambda c: ~F.array_contains("used", c),
                ), 1,
            ),
            F.lit(0),
        )
        newly = (
            winners.join(used, "id", "left")
            .select("id", F.coalesce(free, F.lit(0)).alias("new_color"))
        )
        new_state = (
            state.join(newly.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                F.coalesce("color", F.col("new_color")).alias("color"),
                "prio",
            )
            .localCheckpoint(eager=True)
        )
        state.unpersist()
        state = new_state.persist(StorageLevel.MEMORY_AND_DISK)
        if verbose:
            print(f"[coloring] round {it}")

    sym.unpersist()
    return state.select("id", F.col("color").cast("int").alias("color"))


def count_conflicts(graph: Graph, colors: DataFrame) -> int:
    """Zero-conflict validation (simple_coloring.cpp:262):
    map_reduce_edges counting monochromatic edges."""
    a = colors.select(F.col("id").alias("src"), F.col("color").alias("ca"))
    b = colors.select(F.col("id").alias("dst"), F.col("color").alias("cb"))
    return (
        graph.edges.join(a, "src").join(b, "dst")
        .filter(F.col("ca") == F.col("cb"))
        .count()
    )
