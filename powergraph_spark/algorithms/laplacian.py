"""Graph Laplacian construction for spectral partitioning.

Reference: /root/reference/toolkits/graph_analytics/graph_laplacian.cpp
:95-131 (weighted degree gather -> 1/sqrt(d) -> edge reweight
w' = w * d_i^-1/2 * d_j^-1/2) and the two writers at :182-227:

- normalized_cut: off-diagonal entries are the D^-1/2 W D^-1/2
  weights, emitted in BOTH directions; the diagonal entry is the
  constant 2.0 (graph_laplacian.cpp:190 — the reference's literal).
- ratio_cut: off-diagonals are the raw weights; diagonal is
  (diag_base - degree) (graph_laplacian.cpp:213 hardcodes
  diag_base = 5.0; exposed here as a parameter, default mirrors the
  reference).

Output: COO entries (i, j, value) of the Laplacian-like matrix the
reference writes, as a DataFrame — ready for a downstream solver.
All expression-level; two partial-agg'd shuffles (degrees + join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph


def graph_laplacian(
    graph: Graph,
    weight_col: str | None = None,
    mode: str = "normalized_cut",
    diag_base: float = 5.0,
) -> DataFrame:
    """(i, j, value) COO rows; symmetric (both directions emitted)."""
    w = (F.col(weight_col) if weight_col else F.lit(1.0)).cast("double")
    und = graph.symmetrized_edges()
    if weight_col:
        # symmetrize the weights too: keep per-direction weight
        fwd = graph.edges.select("src", "dst", w.alias("w"))
        rev = graph.edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), w.alias("w")
        )
        und = fwd.unionAll(rev).groupBy("src", "dst").agg(
            F.max("w").alias("w")
        )
    else:
        und = und.withColumn("w", F.lit(1.0))

    # weighted degree over ALL incident edges (gather at :95-109)
    deg = und.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("d"))

    if mode == "normalized_cut":
        di = deg.select(F.col("id").alias("src"),
                        (F.lit(1.0) / F.sqrt("d")).alias("_di"))
        dj = deg.select(F.col("id").alias("dst"),
                        (F.lit(1.0) / F.sqrt("d")).alias("_dj"))
        off = (
            und.join(di.hint("shuffle_hash"), "src")
            .join(dj.hint("shuffle_hash"), "dst")
            .select(
                F.col("src").alias("i"),
                F.col("dst").alias("j"),
                (F.col("w") * F.col("_di") * F.col("_dj")).alias("value"),
            )
        )
        diag = graph.vertices.select(
            F.col("id").alias("i"),
            F.col("id").alias("j"),
            F.lit(2.0).alias("value"),  # graph_laplacian.cpp:190
        )
    elif mode == "ratio_cut":
        off = und.select(
            F.col("src").alias("i"), F.col("dst").alias("j"),
            F.col("w").alias("value"),
        )
        diag = (
            graph.vertices.select("id")
            .join(deg, "id", "left")
            .select(
                F.col("id").alias("i"),
                F.col("id").alias("j"),
                (F.lit(diag_base) - F.coalesce("d", F.lit(0.0))).alias("value"),
            )
        )
    else:
        raise ValueError(mode)
    return off.unionByName(diag)


def write_spectral_inputs(
    graph: Graph,
    prefix: str,
    mode: str = "normalized_cut",
    weight_col: str | None = None,
    diag_base: float = 5.0,
) -> dict:
    """Solver-input prep for the spectral partitioning workflow —
    the file contract of /root/reference/toolkits/graph_analytics/
    partitioning.cpp (which shells graph_laplacian -> svd -> kmeans):

    - ``<prefix>.glap/``    space-separated COO text rows ``i j value``
      of the Laplacian (graph_laplacian.cpp writers :182-227), written
      distributed (one part file per partition — the reference's
      save(K files) shape, concatenable downstream).
    - ``<prefix>.datanum``  single integer: vertex count
      (graph_laplacian.cpp:310-317).
    - ``<prefix>.init``     Lanczos initial vector, line i =
      0.1*((i+1)%10)/10.0 for i in 0..n (partitioning.cpp:82-88,
      num_data+1 rows). Inherently a single ordered file (the solver
      reads it positionally), so it is written single-partition —
      |V|+1 doubles, the same driver-side cost the reference pays.

    All paths go through the Hadoop FileSystem API (hdfs/s3a-safe).
    Returns {"glap": ..., "datanum": ..., "init": ..., "num_data": n}.
    """
    from ..checkpoint import _Fs

    spark = graph.edges.sparkSession
    coo = graph_laplacian(graph, weight_col=weight_col, mode=mode,
                          diag_base=diag_base)
    glap = f"{prefix}.glap"
    (
        coo.select(
            F.concat_ws(" ", F.col("i").cast("string"),
                        F.col("j").cast("string"),
                        F.col("value").cast("string")).alias("line")
        )
        .write.mode("overwrite").text(glap)
    )
    n = graph.num_vertices()
    fs = _Fs(spark, prefix)
    fs.write_text(f"{prefix}.datanum", str(n))
    (
        spark.range(0, n + 1)
        .selectExpr("CAST(0.1 * ((id + 1) % 10) / 10.0 AS DOUBLE) AS v")
        .selectExpr("CAST(v AS STRING) AS line")
        .coalesce(1)
        .write.mode("overwrite").text(f"{prefix}.init")
    )
    return {"glap": glap, "datanum": f"{prefix}.datanum",
            "init": f"{prefix}.init", "num_data": n}
