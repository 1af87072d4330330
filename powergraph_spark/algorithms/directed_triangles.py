"""Directed triangle census.

Reference: /root/reference/toolkits/graph_analytics/directed_triangle_count.cpp
:288-345 (the four classes), :560-606 (per-edge intersections),
:612-640 (per-vertex gather), :666-668 (totals).

Per directed edge (u -> v) the reference counts three intersections
(:588-600, "notation from the paper"):
    s_s(u,v)   = |out(u) ∩ out(v)|
    st_st(u,v) = |in(u)  ∩ in(v)|
    st_s(u,v)  = |in(u)  ∩ out(v)|
and folds them into per-vertex counts (:625-636):
    out_triangles(x)     = Σ_{x->t}  s_s(x,t)
    through_triangles(x) = Σ_{x->t}  st_st(x,t)
    cycle_triangles(x)   = Σ_{x->t}  st_s(x,t)
    in_triangles(x)      = Σ_{s->x}  st_st(s,x)
Totals are the plain vertex sums (:666-668, no normalization).

Spark mapping: adjacency sets per vertex (two partially-aggregated
collect_set shuffles), per-edge intersection via JVM array_intersect,
then two partial-agg'd groupBys. The reference holds the same full
neighbor sets per vertex (vid_vector with a hash threshold), so the
O(deg) hub cost matches the reference's own shape; the degree-ordered
orientation trick of the undirected counter cannot apply because all
four direction classes are needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..graph import Graph


def directed_triangle_counts(graph: Graph) -> DataFrame:
    """(id, in_triangles, out_triangles, through_triangles,
    cycle_triangles) for every vertex."""
    P = graph.num_partitions
    e = graph.edges.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)

    outs = e.groupBy(F.col("src").alias("id")).agg(
        F.collect_set("dst").alias("out_set")
    )
    ins = e.groupBy(F.col("dst").alias("id")).agg(
        F.collect_set("src").alias("in_set")
    )
    sets = (
        graph.vertices.select("id")
        .join(outs, "id", "left")
        .join(ins, "id", "left")
        .select(
            "id",
            F.coalesce("out_set", F.array().cast("array<long>")).alias("out_set"),
            F.coalesce("in_set", F.array().cast("array<long>")).alias("in_set"),
        )
        .repartition(P, "id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    u = sets.select(
        F.col("id").alias("src"),
        F.col("out_set").alias("u_out"),
        F.col("in_set").alias("u_in"),
    )
    v = sets.select(
        F.col("id").alias("dst"),
        F.col("out_set").alias("v_out"),
        F.col("in_set").alias("v_in"),
    )
    per_edge = (
        e.join(u.hint("shuffle_hash"), "src")
        .join(v.hint("shuffle_hash"), "dst")
        .select(
            "src",
            "dst",
            F.size(F.array_intersect("u_out", "v_out")).alias("s_s"),
            F.size(F.array_intersect("u_in", "v_in")).alias("st_st"),
            F.size(F.array_intersect("u_in", "v_out")).alias("st_s"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    from_out = per_edge.groupBy(F.col("src").alias("id")).agg(
        F.sum("s_s").alias("out_triangles"),
        F.sum("st_st").alias("through_triangles"),
        F.sum("st_s").alias("cycle_triangles"),
    )
    from_in = per_edge.groupBy(F.col("dst").alias("id")).agg(
        F.sum("st_st").alias("in_triangles")
    )
    out = (
        graph.vertices.select("id")
        .join(from_out, "id", "left")
        .join(from_in, "id", "left")
        .select(
            "id",
            F.coalesce("in_triangles", F.lit(0)).cast("long")
            .alias("in_triangles"),
            F.coalesce("out_triangles", F.lit(0)).cast("long")
            .alias("out_triangles"),
            F.coalesce("through_triangles", F.lit(0)).cast("long")
            .alias("through_triangles"),
            F.coalesce("cycle_triangles", F.lit(0)).cast("long")
            .alias("cycle_triangles"),
        )
    )
    return out


def directed_triangle_totals(graph: Graph) -> DataFrame:
    """One-row totals, the reference's default output (:759-763)."""
    per_v = directed_triangle_counts(graph)
    return per_v.agg(
        F.sum("in_triangles").cast("long").alias("in_triangles"),
        F.sum("out_triangles").cast("long").alias("out_triangles"),
        F.sum("through_triangles").cast("long").alias("through_triangles"),
        F.sum("cycle_triangles").cast("long").alias("cycle_triangles"),
    )
