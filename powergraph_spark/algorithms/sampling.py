"""Fixed-fanout layerwise neighbor sampling (the GraphSAGE /
GNN-mini-batch shape, Hamilton et al. 2017).

An engine extension (SURVEY §2.9) for the training-data mission: at
web scale a GNN never trains on full neighborhoods — it samples up to
`fanout[h]` neighbors per vertex per hop. Draws are md5-ranked on
(seed, src, dst) — the same deterministic-draw discipline as
datapipe.clean.hash_split — so the sample is reproducible across
reruns, partitionings and engines, and the DuckDB oracle replays it
bit-for-bit.

Plan shape per hop: one frontier×edges join (co-partitioned on the
vertex key) + one per-src top-f rank. The rank filter compiles to
Spark 4.1's WindowGroupLimit, so each partition keeps only f rows per
src before the shuffle — no hub ever materializes its full edge list
in one task beyond the scan (the PowerGraph hub discipline,
distributed_ingress_base.hpp:545, carried to sampling).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..graph import Graph


def neighbor_sample(
    graph: Graph,
    seeds: DataFrame,
    fanouts: Sequence[int],
    seed: int = 42,
    directed: bool = False,
) -> DataFrame:
    """(hop, src, dst): up to fanouts[h-1] sampled neighbors per
    frontier vertex per hop, frontier = distinct sampled endpoints of
    the previous hop. `seeds` carries (id). Deterministic: neighbors
    ranked by md5('<seed>|<src>|<dst>'), ties (impossible in practice)
    by dst."""
    e = (
        graph.edges.select("src", "dst")
        if directed
        else graph.symmetrized_edges()
    )
    frontier = seeds.select(F.col("id").alias("src")).distinct()
    out = None
    for hop, f in enumerate(fanouts, start=1):
        cand = frontier.join(e, "src")
        rank_key = F.md5(
            F.concat_ws("|", F.lit(seed), F.col("src"), F.col("dst"))
        )
        w = Window.partitionBy("src").orderBy(rank_key.asc(), F.col("dst").asc())
        samp = (
            cand.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= int(f))
            .select(F.lit(hop).alias("hop"), "src", "dst")
        )
        out = samp if out is None else out.unionAll(samp)
        frontier = samp.select(F.col("dst").alias("src")).distinct()
    return out
