"""Node embeddings: SPPMI of a walk co-occurrence matrix, factorized
by the repo's distributed truncated SVD.

Public knowledge: DeepWalk (Perozzi, Al-Rfou & Skiena, KDD 2014)
learns skip-gram embeddings over random-walk corpora; Levy & Goldberg
(NeurIPS 2014) show skip-gram-with-negative-sampling implicitly
factorizes the shifted PPMI co-occurrence matrix; NetMF (Qiu et al.,
WSDM 2018) makes that matrix-factorization route explicit. This
composition takes the explicit route on machinery the repo already
owns: deterministic walks (algorithms/walks.py, toolkit extension) ->
windowed co-occurrence counts -> SPPMI -> block-power truncated SVD
(algorithms/svd.py, parity with toolkits/collaborative_filtering/
svd.cpp) -> row vectors scaled by sqrt(singular value).

Scale shape (100 TB): the walk corpus is |V|*walks*length rows;
co-occurrence pairs are generated INSIDE each walk row by a pure-JVM
nested-sequence expression (<= 2*window structs per position — no
self-join of the corpus) and collapse through one map-side-combined
groupBy; the SPPMI marginals are id-keyed rows joined back
shuffle-hash (never driver state); the factorization's only global
object is the k x k Gram. Everything is deterministic (md5 walk
draws, hash SVD init), so results are parallelism-invariant and the
co-occurrence/SPPMI stage is SQL-oracle-replayable.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph
from .als import ratings_graph
from .svd import svd
from .walks import random_walks


def walk_cooccurrence(walks: DataFrame, window: int = 2) -> DataFrame:
    """(a, b, cnt): windowed skip-gram co-occurrence counts over a
    walk table with a ``path`` array column — every ordered
    (center, context) pair at distance 1..window, both directions.
    Pair generation is a per-row JVM expression; the only shuffle is
    the count groupBy (map-side combined)."""
    pairs = F.expr(
        f"""flatten(transform(sequence(1, size(path)), i ->
      transform(
        filter(sequence(greatest(1, i - {window}),
                        least(size(path), i + {window})),
               j -> j != i),
        j -> struct(element_at(path, i) AS a,
                    element_at(path, j) AS b))))"""
    )
    return (
        walks.select(F.explode(pairs).alias("p"))
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )


def sppmi(cooc: DataFrame, shift: float = 1.0) -> DataFrame:
    """Shifted positive PMI entries (a, b, val):
    max(0, ln(cnt * total / (row_a * col_b)) - ln(shift)), zero
    entries dropped (the Levy-Goldberg SPPMI matrix, shift = the
    negative-sampling count). total is the one driver-side scalar;
    marginals stay distributed and join back shuffle-hash."""
    total = float(cooc.agg(F.sum("cnt")).first()[0] or 0.0)
    if total <= 0:
        return cooc.select(
            "a", "b", F.lit(0.0).alias("val")
        ).limit(0)
    rowm = cooc.groupBy("a").agg(F.sum("cnt").alias("r"))
    colm = cooc.groupBy("b").agg(F.sum("cnt").alias("s"))
    j = (
        cooc.join(rowm.hint("shuffle_hash"), "a")
        .join(colm.hint("shuffle_hash"), "b")
    )
    val = F.log(
        (F.col("cnt") * F.lit(total)) / (F.col("r") * F.col("s"))
    ) - F.lit(math.log(shift))
    return j.select("a", "b", val.alias("val")).filter(
        F.col("val") > 0
    )


@dataclass
class EmbeddingResult:
    vectors: DataFrame          # (id, vector array<double> length k)
    singular_values: list[float]
    n_entries: int              # nonzero SPPMI entries factorized


def node_embeddings(
    graph: Graph,
    k: int = 4,
    window: int = 2,
    walks_per_vertex: int = 1,
    walk_length: int = 3,
    svd_iterations: int = 8,
    shift: float = 1.0,
    seed: str = "emb",
) -> EmbeddingResult:
    """DeepWalk-as-matrix-factorization: embedding of node v = row v
    of U_k * sqrt(Sigma_k) from the truncated SVD of the walk-corpus
    SPPMI matrix. Nodes absent from every positive SPPMI entry get
    zero vectors (svd's missing-row convention)."""
    wk = random_walks(
        graph, walks_per_vertex=walks_per_vertex, length=walk_length,
        seed=seed,
    )
    m = sppmi(walk_cooccurrence(wk.walks, window=window), shift=shift)
    n_entries = m.count()
    g = ratings_graph(
        m.selectExpr("a AS user", "b AS item", "val AS rating"),
        num_partitions=graph.num_partitions,
    )
    res = svd(g, k=k, iterations=svd_iterations)
    sqrt_sig = F.array(
        *[F.lit(math.sqrt(max(s, 0.0))) for s in res.singular_values]
    )
    vectors = res.user_vectors.select(
        "id",
        F.zip_with("arr", sqrt_sig, lambda x, s: x * s).alias("vector"),
    )
    return EmbeddingResult(
        vectors=vectors,
        singular_values=res.singular_values,
        n_entries=n_entries,
    )
