"""Synchronous modularity-ascent community moves (the local-move
phase of Louvain, BSP-determinized).

An engine extension (SURVEY §2.9) complementing label propagation
(/root/reference/toolkits/graph_analytics has LP only): instead of
majority labels, every vertex simultaneously joins the neighbor
community with the highest modularity gain (Blondel et al. 2008,
local-move rule), evaluated against the PREVIOUS round's assignment —
the same BSP determinization this repo uses for LP/SGD/Gibbs, so the
result is independent of partitioning and executor count.

Integer-exact scoring: on an unweighted graph the gain ordering
    ΔQ(i→c) ∝ k_{i,c} − k_i · Σ_tot(c∖i) / (2m)
is preserved by the ×2m-scaled integer score
    score(i, c) = 2m·k_{i,c} − k_i·(Σ_tot(c) − [c = c_i]·k_i)
so the argmax (ties → smaller community id) involves NO float
comparisons — the oracle SQL replays it exactly, and cross-engine
rounding cannot flip a move. (At 10^12-edge scale the products stay
within int64 while 2m < ~3·10^9 and max degree < ~10^5; beyond that
the same expression degrades to double with documented tie risk.)

Plan shape per round: one groupBy for community masses, one
edge×label join + pair-count aggregate for k_{i,c} (partial-agg,
co-partitioned on the vertex key), one per-vertex window argmax.
Everything JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..graph import Graph
from .summary import _und_degrees, _und_edges


def louvain_moves(graph: Graph, rounds: int = 2) -> DataFrame:
    """(id, community) after `rounds` synchronous local-move rounds
    from singleton communities. Deterministic: integer scores, ties
    broken by smaller community id."""
    und = _und_edges(graph)
    deg = _und_degrees(und)
    sym = und.select("a", "b").unionAll(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    m = und.count()
    lab = deg.select("id", F.col("id").alias("community"))
    for _ in range(rounds):
        # Σ_tot per community
        mass = (
            deg.join(lab, "id")
            .groupBy("community")
            .agg(F.sum("deg").alias("sigma"))
        )
        # k_{i,c}: edges from i into community c (previous assignment)
        nbr_c = (
            sym.join(
                lab.select(F.col("id").alias("b"), F.col("community").alias("c")),
                "b",
            )
            .groupBy(F.col("a").alias("id"), "c")
            .agg(F.count(F.lit(1)).alias("k_ic"))
        )
        # candidate set = neighbor communities ∪ own community
        own = lab.select("id", F.col("community").alias("c"))
        cand = nbr_c.join(own, ["id", "c"], "full").select(
            "id", "c", F.coalesce("k_ic", F.lit(0)).alias("k_ic")
        )
        scored = (
            cand.join(lab, "id")
            .join(deg, "id")
            .join(mass.withColumnRenamed("community", "c"), "c")
            .select(
                "id",
                "c",
                (
                    2 * F.lit(m) * F.col("k_ic")
                    - F.col("deg")
                    * (
                        F.col("sigma")
                        - F.when(F.col("c") == F.col("community"), F.col("deg"))
                        .otherwise(F.lit(0))
                    )
                ).alias("score"),
            )
        )
        w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("c").asc())
        best = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("id", F.col("c").alias("best_c"))
        )
        # singleton-swap guard (Lu, Halappanavar & Kalyanaraman 2015):
        # synchronous moves between two SINGLETON communities oscillate
        # forever (i->j while j->i); allow such a move only toward the
        # smaller community id, which breaks the symmetry and lets
        # cliques coalesce deterministically.
        sizes = lab.groupBy("community").agg(F.count(F.lit(1)).alias("n"))
        own_n = sizes.withColumnRenamed("community", "own_c").withColumnRenamed(
            "n", "own_n"
        )
        tgt_n = sizes.withColumnRenamed("community", "best_c").withColumnRenamed(
            "n", "tgt_n"
        )
        lab = (
            best.join(lab.withColumnRenamed("community", "own_c"), "id")
            .join(own_n, "own_c")
            .join(tgt_n, "best_c")
            .select(
                "id",
                F.when(
                    (F.col("own_n") == 1)
                    & (F.col("tgt_n") == 1)
                    & (F.col("best_c") > F.col("own_c")),
                    F.col("own_c"),
                )
                .otherwise(F.col("best_c"))
                .alias("community"),
            )
        )
        lab = lab.localCheckpoint(eager=True)  # truncate per-round lineage
    return lab
