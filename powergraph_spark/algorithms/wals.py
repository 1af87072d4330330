"""Weighted Alternating Least Squares on the GAS runtime.

Reference: /root/reference/toolkits/collaborative_filtering/wals.cpp
- identical bipartite ratings graph to ALS, but every edge carries a
  weight alongside the observation (:123-145 edge_data(obs, role,
  weight), parsed as the 4th input column; default weight 1).
- gather over TRAIN edges (:224-231): XtX += w * f fᵀ and
  Xy += w * f * obs of the OTHER endpoint — the ONLY semantic delta
  from als.cpp's gather.
- apply (:320-337): flat regularization XtX(i,i) += LAMBDA
  (:331 — explicitly NOT divided by nneighbors, unlike als.cpp's
  --regnormal default), LDLT solve, residual = L1 change / NLATENT.
- defaults LAMBDA = 0.01, TOLERANCE = 1e-3 (:433-434), same
  priority-tolerance scheduling as ALS (:352-361).

Spark mapping: wals() IS als() with the weighted gather — the same
scatter join + segmented Arrow normal-equation kernel, with the edge
weight folded into the per-row outer product and Xy contribution
before the segmented reduction (als._solve_side ``weighted``). Only
(id, k-vector) rows shuffle; the weight rides the already-persisted
edge table. regnormal defaults False to match the reference's flat
lambda.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..graph import Graph
from .als import ALSResult, als


def wals(
    graph: Graph,
    k: int = 10,
    lam: float = 0.01,
    regnormal: bool = False,  # wals.cpp:331 flat LAMBDA
    tolerance: float = 1e-3,
    max_iterations: int = 10,
    init_expr: str | None = None,
    with_rmse: bool = True,
    verbose: bool = False,
) -> ALSResult:
    """Run weighted ALS on a ratings_graph built with ``weight_col``.
    A graph without a weight column runs with the reference's default
    weight of 1 on every edge (wals.cpp:144) — i.e. plain ALS under
    the flat-lambda regularization."""
    g = graph
    if "weight" not in g.edges.columns:
        g = Graph(
            vertices=graph.vertices,
            edges=graph.edges.withColumn("weight", F.lit(1.0)),
            num_partitions=graph.num_partitions,
        )
    return als(
        g,
        k=k,
        lam=lam,
        regnormal=regnormal,
        tolerance=tolerance,
        max_iterations=max_iterations,
        init_expr=init_expr,
        with_rmse=with_rmse,
        weighted=True,
        verbose=verbose,
    )
