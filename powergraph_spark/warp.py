"""The Warp engine surface as a named API.

Reference: /root/reference/src/graphlab/engine/warp_graph_mapreduce.hpp:62
(map_reduce_neighborhood), warp_graph_transform.hpp
(transform_neighborhood), warp_graph_broadcast.hpp
(broadcast_neighborhood), and apps built on them
(warp_bond_percolation.cpp).

PowerGraph's warp functions are blocking per-vertex neighborhood
operations. Spark-first, a "neighborhood op over every vertex at once"
IS one join + one aggregation, so each warp call maps to a single
declarative plan (no engine loop):

- map_reduce_neighborhood: edges join neighbor data -> map expression
  -> groupBy(center).agg(combine) — one partially-aggregated shuffle.
- transform_neighborhood: edge table join both endpoints -> edge
  update expression (returns a new edge DataFrame).
- broadcast_neighborhood: push a center-vertex column to every
  neighbor (the scatter half of GAS as a standalone op).

These are thin by design: the point is a *named, checkable* surface
for the warp API rows in SURVEY §2.4, all compiled by Catalyst.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .graph import Graph


def _directed_view(graph: Graph, direction: str) -> DataFrame:
    """(center, nbr) pairs for the requested gather direction."""
    e = graph.edges
    out_v = e.select(F.col("src").alias("center"), F.col("dst").alias("nbr"))
    in_v = e.select(F.col("dst").alias("center"), F.col("src").alias("nbr"))
    if direction == "out":
        return out_v
    if direction == "in":
        return in_v
    if direction == "all":
        return in_v.unionAll(out_v)  # ALL_EDGES multiset
    raise ValueError(direction)


def map_reduce_neighborhood(
    graph: Graph,
    vertex_data: DataFrame,
    map_fn: Callable[[Column], Column] | None,
    combine: str = "sum",
    direction: str = "in",
    value_col: str | None = None,
    out_col: str = "agg",
) -> DataFrame:
    """warp::map_reduce_neighborhood (warp_graph_mapreduce.hpp:62):
    for every vertex, combine(map(neighbor_data)) over the chosen
    neighborhood. vertex_data: (id, <value_col>); map_fn maps the
    neighbor's value column (None = identity); combine is any Spark
    aggregate name (sum/min/max/avg/count/collect_set...).
    Returns (id, <out_col>) with one row per graph vertex (vertices
    with no neighbors get null, as the reference leaves the mapper's
    default)."""
    vcol = value_col or [c for c in vertex_data.columns if c != "id"][0]
    view = _directed_view(graph, direction)
    nbr = vertex_data.select(
        F.col("id").alias("nbr"), F.col(vcol).alias("_v")
    )
    mapped = view.join(nbr.hint("shuffle_hash"), "nbr").select(
        "center",
        (map_fn(F.col("_v")) if map_fn is not None else F.col("_v")).alias("_m"),
    )
    agg = mapped.groupBy(F.col("center").alias("id")).agg(
        getattr(F, combine)("_m").alias(out_col)
    )
    return graph.vertices.select("id").join(agg, "id", "left")


def broadcast_neighborhood(
    graph: Graph,
    vertex_data: DataFrame,
    value_col: str,
    direction: str = "out",
) -> DataFrame:
    """warp::broadcast_neighborhood: deliver a center vertex's value to
    each neighborhood member. Returns (id, from_id, <value_col>) — one
    row per (receiving vertex, sending center)."""
    view = _directed_view(graph, direction)
    src_vals = vertex_data.select(
        F.col("id").alias("center"), F.col(value_col)
    )
    return view.join(src_vals.hint("shuffle_hash"), "center").select(
        F.col("nbr").alias("id"), F.col("center").alias("from_id"), value_col
    )


def transform_neighborhood(
    graph: Graph,
    vertex_data: DataFrame,
    edge_fn: Callable[[Column, Column], Column],
    value_col: str,
    out_col: str = "edata",
) -> Graph:
    """warp::transform_neighborhood (warp_graph_transform.hpp): update
    every edge from both endpoints' vertex values. edge_fn(src_val,
    dst_val) -> new edge-data column. Returns a new Graph whose edges
    carry <out_col>."""
    sv = vertex_data.select(F.col("id").alias("src"),
                            F.col(value_col).alias("_sv"))
    dv = vertex_data.select(F.col("id").alias("dst"),
                            F.col(value_col).alias("_dv"))
    e = (
        graph.edges.join(sv.hint("shuffle_hash"), "src")
        .join(dv.hint("shuffle_hash"), "dst")
        .withColumn(out_col, edge_fn(F.col("_sv"), F.col("_dv")))
        .drop("_sv", "_dv")
    )
    return Graph(e, graph.vertices, graph.num_partitions)


def bond_percolation(
    graph: Graph, survive_prob: float, seed: int = 42
) -> DataFrame:
    """Bond percolation (warp_bond_percolation.cpp): keep each edge
    independently with probability survive_prob (deterministic seeded
    hash), then label the percolation clusters via the engine's
    connected components. Returns (id, component).

    The per-edge uniform is md5-derived (first 8 hex digits / 16^8) so
    an ANSI-SQL oracle reproduces the exact surviving edge set."""
    from .algorithms import connected_components

    u = (
        F.expr(
            f"conv(substring(md5(concat('{seed}:', src, ',', dst)), 1, 8),"
            " 16, 10)"
        ).cast("long")
        / F.lit(float(16 ** 8))
    )
    kept = graph.edges.filter(u < survive_prob).select("src", "dst")
    sub = Graph.from_edges(
        kept,
        vertices=graph.vertices,
        num_partitions=graph.num_partitions,
    )
    res = connected_components(sub)
    out = res.state.select("id", "component")
    sub.unpersist()
    return out


def warp_coloring(graph: Graph, max_iterations: int = 200) -> DataFrame:
    """warp_coloring.cpp: greedy min-free-color with the neighborhood
    color set gathered through warp::map_reduce_neighborhood
    (unique_color_map/combine at warp_coloring.cpp:104-113, min-free
    apply at :224-233). The reference resolves synchronous-recoloring
    conflicts by re-running warp rounds; BSP-side we use the same
    hash-priority independent-set schedule as the simple colorer —
    identical capability contract (valid coloring, deterministic), and
    the per-round neighborhood color gather IS the warp map_reduce
    (one join + collect_set aggregation per wave). Returns (id, color).
    """
    from .algorithms import coloring

    return coloring(graph, max_iterations=max_iterations, order="jp")
