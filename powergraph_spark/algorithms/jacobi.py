"""Jacobi linear solver (Ax = b) — the linear_solvers toolkit.

Reference: /root/reference/toolkits/linear_solvers/jacobi.cpp
- the square matrix IS the graph: an input entry (i, j, v) with
  i == j sets the vertex's diagonal A_ii (:166-171); off-diagonal
  entries become edges carrying v (:173-174). A vertex without an
  explicit diagonal entry defaults A_ii = 1 (:60 vertex_data ctor).
- b is an optional dense vector (JACOBI_Y, :289-305); absent
  components are 0. x starts at 0 (:64 pvec = zeros).
- the driver loop runs a FIXED iteration count of
      x = (b - A_offdiag * x) / A_ii            (:322-326,
  mi.use_diag = false excludes the diagonal from the mat-vec), then
  reports the final residual ||A x - b||_2 WITH the diagonal
  (:330-335).

Spark mapping: one iteration is ONE mat-vec — the off-diagonal entry
table joined with the current x on the column id (shuffle-hash; under
AQE a |V|-row x side can flip to a per-iteration broadcast at scale),
partial-agg summed by row id — plus the element-wise apply against
the persisted (id, b, aii) vertex table. Only (id, x) rows and the
P*|rows| partial sums shuffle per iteration; the entry table
partitions once. x is materialized origin-free per iteration
(truncate_plan) so plan size stays constant over deep runs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..gas import truncate_plan


@dataclass
class JacobiResult:
    x: DataFrame          # (id, x) — the solution iterate
    residual_norm: float  # ||A x - b||_2, diagonal included
    iterations: int


def jacobi(
    entries: DataFrame,
    b: DataFrame | None = None,
    max_iterations: int = 10,  # jacobi.cpp:52 max_iter
    num_partitions: int | None = None,
    row_col: str = "row",
    col_col: str = "col",
    val_col: str = "val",
    b_col: str = "b",
    verbose: bool = False,
) -> JacobiResult:
    """Solve Ax = b by Jacobi iteration.

    ``entries``: COO matrix (row, col, val); diagonal rows (row ==
    col) set A_ii, every other row is an off-diagonal entry. Vertices
    without an explicit diagonal default A_ii = 1 (jacobi.cpp:60).
    ``b``: (id, b); missing ids are 0, None means b = 0 everywhere.
    Runs the reference's fixed iteration count from x = 0 and returns
    the final iterate plus ||Ax - b||_2.
    """
    spark = entries.sparkSession
    P = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    A = entries.select(
        F.col(row_col).cast("long").alias("row"),
        F.col(col_col).cast("long").alias("col"),
        F.col(val_col).cast("double").alias("val"),
    )
    bdf = (
        b.select(F.col("id").cast("long").alias("id"),
                 F.col(b_col).cast("double").alias("b"))
        if b is not None
        else spark.createDataFrame([], "id long, b double")
    )
    ids = (
        A.select(F.col("row").alias("id"))
        .unionAll(A.select(F.col("col").alias("id")))
        .unionAll(bdf.select("id"))
        .distinct()
    )
    diag = A.filter(F.col("row") == F.col("col")).select(
        F.col("row").alias("id"), F.col("val").alias("aii")
    )
    # (id, b, aii): the per-vertex constants, partitioned like x
    vert = (
        ids.join(diag.hint("shuffle_hash"), "id", "left")
        .join(bdf.hint("shuffle_hash"), "id", "left")
        .select(
            "id",
            F.coalesce("b", F.lit(0.0)).alias("b"),
            F.coalesce("aii", F.lit(1.0)).alias("aii"),
        )
        .repartition(P, "id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_zero_diag = vert.filter(F.col("aii") == 0.0).count()
    if n_zero_diag:
        vert.unpersist()
        raise ValueError(
            f"jacobi: {n_zero_diag} zero diagonal entries — the "
            "update x = (b - A_offdiag x) / A_ii is undefined"
        )
    off = (
        A.filter(F.col("row") != F.col("col"))
        .repartition(P, "col")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    off.count()

    x = vert.select("id", F.lit(0.0).alias("x"))
    it = 0
    for it in range(1, max_iterations + 1):
        s = (
            off.join(
                x.selectExpr("id AS col", "x AS xv").hint("shuffle_hash"),
                "col",
            )
            .groupBy(F.col("row").alias("id"))
            .agg(F.sum(F.col("val") * F.col("xv")).alias("s"))
        )
        x = truncate_plan(
            vert.join(s.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                ((F.col("b") - F.coalesce("s", F.lit(0.0)))
                 / F.col("aii")).alias("x"),
            )
        )
        if verbose:
            print(f"[jacobi] iteration {it}/{max_iterations}")

    # final residual WITH the diagonal (jacobi.cpp:330-335):
    # r_i = (offsum_i + aii * x_i) - b_i
    s = (
        off.join(
            x.selectExpr("id AS col", "x AS xv").hint("shuffle_hash"),
            "col",
        )
        .groupBy(F.col("row").alias("id"))
        .agg(F.sum(F.col("val") * F.col("xv")).alias("s"))
    )
    row = (
        vert.join(x, "id")
        .join(s.hint("shuffle_hash"), "id", "left")
        .select(
            (
                F.coalesce("s", F.lit(0.0))
                + F.col("aii") * F.col("x") - F.col("b")
            ).alias("r")
        )
        .agg(F.sqrt(F.sum(F.col("r") * F.col("r"))).alias("norm"))
        .first()
    )
    off.unpersist()
    vert.unpersist()
    return JacobiResult(
        x=x, residual_norm=float(row["norm"] or 0.0), iterations=it
    )
