"""Chromatic Gibbs sampling over a Potts/Ising MRF — the reference's
chromatic sampler re-expressed as color-class-parallel DataFrame
supersteps.

Reference: /root/reference/toolkits/graphical_models/deprecated/
gibbs_sampling/chromatic_sampler.cpp (+ mrf.cpp): a proper graph
coloring partitions the vertices into independent sets; sweeping the
color classes sequentially while sampling every vertex of the current
class in PARALLEL is a correct Gibbs sampler (no vertex is ever
sampled concurrently with a neighbor — chromatic_sampler.cpp's core
invariant).  The reference schedules the classes with its chromatic
engine; here each class update is one Spark job:

    neighbor states scatter onto the undirected edge view (shuffle-
    hash join on the vertex key), per-target per-state counts partial+
    final aggregate, the conditional draw is a pure JVM expression
    (exp / cumulative inverse-CDF on an md5-uniform), and the class's
    new states re-join the persisted remainder.

Determinism: every draw is md5(seed : sweep : color : id) — the same
sample on any cluster size, partitioning, or re-run, and nibble-
replayable in ANSI SQL (same scheme as warp.py's bond percolation and
the LDA sampler).  BSP-determinized visit order: classes ascend by
color id, sweeps are synchronous barriers — the reference's chromatic
schedule with its intra-class hardware nondeterminism removed.

Model: K-state Potts with coupling beta —
    P(x_v = k | nbrs) ∝ exp(beta * #{u in N(v) : x_u = k})
(beta > 0 smooths, beta < 0 anti-correlates, beta = 0 is uniform;
the Ising case is K = 2).

Scale shape: per class update only (id, x) rows shuffle; the edge
view partitions once and persists; states materialize origin-free per
class step (truncate_plan) so plan size is constant over deep sweeps.
At 10^12-edge scale the class count (≈ max degree for greedy
colorings) bounds the job count per sweep — pair with the repo's
degree-aware ingress so hub classes stay balanced.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..gas import truncate_plan
from ..graph import Graph


@dataclass
class GibbsResult:
    state: DataFrame   # (id, x) — the current sample
    sweeps: int
    n_colors: int


def _u(seed: str, tag: str) -> F.Column:
    """md5-uniform [0,1) on (seed, tag, id) — SQL-replayable."""
    return F.expr(
        f"CAST(conv(substring(md5(concat('{seed}:{tag}:', "
        "CAST(id AS STRING))), 1, 8), 16, 10) AS DOUBLE)"
        " / CAST(4294967296 AS DOUBLE)"
    )


def chromatic_gibbs(
    graph: Graph,
    colors: DataFrame,
    n_states: int = 2,
    beta: float = 1.0,
    sweeps: int = 3,
    seed: str = "gibbs",
    num_partitions: int | None = None,
    validate_coloring: bool = False,
) -> GibbsResult:
    """Run ``sweeps`` full Gibbs sweeps over the Potts model on
    ``graph`` (undirected view), scheduling by the proper coloring in
    ``colors`` (id, color).  Initial states are md5-uniform over
    [0, n_states).  Returns the final (id, x) sample.

    ``validate_coloring=True`` asserts the coloring is proper first
    (an improper class would sample neighbors concurrently — the
    exact race the chromatic schedule exists to prevent).
    """
    if n_states < 2:
        raise ValueError("chromatic_gibbs: n_states must be >= 2")
    spark = graph.vertices.sparkSession
    P = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    colors = colors.select(
        F.col("id").cast("long").alias("id"),
        F.col("color").cast("int").alias("color"),
    )
    # undirected message view: each edge contributes both directions
    e = graph.edges.select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    und = (
        e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .repartition(P, "b")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    und.count()
    if validate_coloring:
        conflicts = (
            und.join(colors.selectExpr("id AS a", "color AS ca"), "a")
            .join(colors.selectExpr("id AS b", "color AS cb"), "b")
            .filter(F.col("ca") == F.col("cb"))
            .count()
        )
        if conflicts:
            und.unpersist()
            raise ValueError(
                f"chromatic_gibbs: improper coloring ({conflicts} "
                "monochromatic edge directions)"
            )

    color_ids = sorted(
        r["color"] for r in colors.select("color").distinct().collect()
    )
    vert = (
        graph.vertices.select("id")
        .join(colors.hint("shuffle_hash"), "id", "left")
        .select("id", F.coalesce("color", F.lit(0)).alias("color"))
        .repartition(P, "id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    vert.count()

    # init: x = floor(u * K), u = md5(seed:init:id)
    state = truncate_plan(
        vert.select(
            "id", "color",
            F.floor(_u(seed, "init") * n_states).cast("int").alias("x"),
        )
    )

    for t in range(sweeps):
        for c in color_ids:
            # per-state neighbor counts for this class only: push the
            # color filter below the aggregation so off-class targets
            # never shuffle
            targets_b = colors.filter(F.col("color") == c).selectExpr(
                "id AS b"
            )
            msgs = und.join(targets_b.hint("shuffle_hash"), "b").join(
                state.selectExpr("id AS a", "x AS nx").hint(
                    "shuffle_hash"
                ),
                "a",
            )
            cnts = msgs.groupBy(F.col("b").alias("id")).agg(
                *[
                    F.sum((F.col("nx") == k).cast("long")).alias(f"c{k}")
                    for k in range(n_states)
                ]
            )
            # conditional draw: p_k ∝ exp(beta * c_k); inverse CDF on
            # the md5-uniform, cumulative in ascending k (isolated
            # vertices get all-zero counts -> uniform)
            upd = state.filter(F.col("color") == c).join(
                cnts.hint("shuffle_hash"), "id", "left"
            )
            ps = [
                F.exp(
                    F.lit(float(beta))
                    * F.coalesce(F.col(f"c{k}"), F.lit(0)).cast("double")
                )
                for k in range(n_states)
            ]
            total = ps[0]
            for p in ps[1:]:
                total = total + p
            u = _u(seed, f"{t}:{c}")
            draw = None
            cum = ps[0]
            for k in range(n_states - 1):
                cond = u < cum / total
                draw = (
                    F.when(cond, F.lit(k))
                    if draw is None
                    else draw.when(cond, F.lit(k))
                )
                if k + 1 < n_states - 1:
                    cum = cum + ps[k + 1]
            draw = draw.otherwise(F.lit(n_states - 1)).cast("int")
            new_class = upd.select("id", "color", draw.alias("x"))
            state = truncate_plan(
                state.filter(F.col("color") != c).unionAll(new_class)
            )

    out = state.select("id", "x")
    und.unpersist()
    vert.unpersist()
    return GibbsResult(state=out, sweeps=sweeps, n_colors=len(color_ids))
