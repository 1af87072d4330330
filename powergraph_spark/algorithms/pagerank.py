"""PageRank — reference semantics from
/root/reference/toolkits/graph_analytics/pagerank.cpp.

Reference contract (pagerank.cpp:76-146):
- init rank = 1.0 (pagerank.cpp:52)
- update: rank'(v) = 0.15 + 0.85 * sum_{u->v} rank(u)/out_deg(u)
  (RESET_PROB at :31, gather at :87-92, apply at :99-106). This is the
  *unnormalized* PowerGraph PageRank — no dangling-mass redistribution,
  no 1/N scaling.
- dynamic convergence: scatter signals a neighbor when |delta| > tol
  (pagerank.cpp:124-135); synchronous full-update to max|delta| <= tol
  is convergence-equivalent and is what we run.

GAS -> DataFrame mapping (SURVEY.md §2.6): scatter join of rank state
onto the edge table + gather groupBy(dst).sum() + apply expression.
Per superstep: exactly two shuffles (state->edge partitions = the
master->mirror vdata broadcast; contributions->dst = the mirror->master
partial-gather merge, synchronous_engine.hpp:1860-1877). Partial
map-side aggregation of the sum is Spark's built-in analog of
pre/post_local_gather (ivertex_program.hpp:729-765), and is what makes
hub in-degrees scale: each edge partition emits one partial sum per
(partition, dst).

Scale notes: the edge table is shuffled ONCE (repartition by src,
persisted); every superstep shuffles only the vertex-state table
(|V| rows, orders of magnitude smaller than |E| at web scale) plus
the partially-aggregated contributions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..checkpoint import CheckpointStore
from ..gas import GASResult, run_gas
from ..graph import Graph

RESET_PROB = 0.15  # pagerank.cpp:31


def pagerank(
    graph: Graph,
    tol: float = 1e-6,
    max_iterations: int = 200,
    damping: float = 0.85,
    checkpoint: CheckpointStore | None = None,
    checkpoint_interval: int = 1,
    check_interval: int = 1,
    mode: str = "dataframe",
    chain_depth: int = 1,
    plan_hook=None,
    resume: bool = False,
    audit_shuffle: bool = False,
    verbose: bool = False,
) -> GASResult:
    """Returns GASResult whose state is (id, rank, out_deg, delta).

    mode='dataframe' (default): the gather is Catalyst's partial+final
    hash aggregate — whole-stage codegen end to end.
    mode='csr': the north-star Arrow kernel — per-partition numpy
    bincount over CSR-indexed local ids produces one partial sum per
    (partition, dst); the final groupBy merges |parts| x |local verts|
    partials instead of |E| rows. Differential-tested against
    'dataframe' (identical semantics).

    chain_depth=k (dataframe mode): fuse k gather/apply rounds into ONE
    Spark job per materialization. The per-round plan references the
    previous round's state exactly once (out_deg lives in a separate
    static cached table), so the chained plan stays linear — no
    recompute blowup — and the driver pays job submission + plan
    analysis + |V|-row cache traffic once per k rounds instead of per
    round. This is the per-superstep fixed-cost lever behind the
    N->4N raw scaling number. Convergence compares rank against the
    chain START (a k-step delta >= the per-step delta on this monotone
    iteration), so stopping is conservative; ranks are byte-identical
    to the unchained run at the same round count. GASResult.supersteps
    counts CHAINS; multiply by chain_depth for rounds.
    """
    if chain_depth > 1 and mode != "dataframe":
        # the fused k-round step exists only for the dataframe plan;
        # silently dividing max_iterations by chain_depth here would
        # run a quarter of the requested rounds.
        raise ValueError(
            f"chain_depth={chain_depth} requires mode='dataframe' (got {mode!r})"
        )
    spark = graph.edges.sparkSession
    P = graph.num_partitions

    # Edge layout for the iteration: hash-partitioned by src and
    # persisted, so the per-superstep scatter join shuffles only the
    # (small) vertex-state side. Only (src, dst) survive column pruning.
    edges = (
        graph.edges.select("src", "dst")
        .repartition(P, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges.count()

    out_deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    init_wide = (
        graph.vertices.select("id")
        # shuffle_hash: one-time setup join, but its subtree is part of
        # the cached static table's plan — keeping it broadcast-free
        # keeps the whole superstep plan broadcast-free (testable).
        .join(out_deg.hint("shuffle_hash"), "id", "left")
        .select(
            "id",
            F.lit(1.0).alias("rank"),  # pagerank.cpp:52
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.lit(float("inf")).alias("delta"),
        )
        .repartition(P, "id")
    )

    # SLIM iteration state (dataframe mode): out_deg never changes, so
    # it lives in its own cached co-partitioned table and the state
    # that re-materializes every superstep is (id, rank, delta) only —
    # measured ~11% per-superstep on the 1M-page corpus at local[2]
    # AND local[8] (less state serialized per localCheckpoint, narrower
    # join rows), byte-identical ranks. The public contract (state
    # includes out_deg) is restored by one final join.
    static = None
    if mode == "dataframe":
        static = init_wide.select("id", "out_deg").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        static.count()
        # init rides the hot static cache: rank/delta are literals, so
        # there is nothing to join — an earlier version re-executed the
        # whole vertices ⋈ out_deg + repartition a second time just to
        # attach two constants (r6 opt: one setup join execution, not
        # two; byte-identical init state).
        init = static.select(
            "id",
            F.lit(1.0).alias("rank"),
            F.lit(float("inf")).alias("delta"),
        )
    else:
        init = init_wide

    def gather_dataframe(state: DataFrame) -> DataFrame:
        # dangling vertices (out_deg=0) contribute nothing (unnormalized
        # reference semantics) — filtering them also shrinks the join
        # input. selectExpr keeps driver-side plan building cheap (one
        # py4j call vs dozens — measurable at ~85 supersteps).
        #
        # shuffle_hash hints: state, static, and edges are all
        # co-partitioned on the join key (state by id from the previous
        # apply, static by id at setup, edges by src at setup), so both
        # SHJs run with ZERO exchange. Without the hints AQE converts
        # these to broadcast joins — a DRIVER-SERIAL collect + rebuild
        # of |V| rows every superstep, which flatlines scaling
        # (measured: ~4s/superstep at 1M vertices regardless of cores).
        return (
            edges.join(
                state.join(static.hint("shuffle_hash"), "id")
                .filter("out_deg > 0")
                .selectExpr("id", "rank / out_deg AS c")
                .hint("shuffle_hash"),
                edges.src == F.col("id"),
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("c").alias("gathered"))
        )

    def gather_csr(state: DataFrame) -> DataFrame:
        """Per-partition sparse gather-scatter (north star): the join
        output is Arrow-batched into numpy; np.unique builds the
        partition-local CSR index of dst ids and np.bincount folds the
        contributions — one partial row per distinct dst per partition
        (the mirror->master partial gather, synchronous_engine.hpp:
        1860-1877). Final merge is a groupBy over the partials."""
        import numpy as np
        import pandas as pd

        joined = edges.join(
            state.filter(F.col("out_deg") > 0).select(
                "id", (F.col("rank") / F.col("out_deg")).alias("c")
            ),
            edges.src == F.col("id"),
        ).select("dst", "c")

        def kern(batches):
            for b in batches:
                dst = b["dst"].to_numpy()
                c = b["c"].to_numpy()
                uniq, inv = np.unique(dst, return_inverse=True)  # local CSR ids
                part = np.bincount(inv, weights=c, minlength=len(uniq))
                yield pd.DataFrame({"id": uniq, "partial": part})

        partials = joined.mapInPandas(kern, schema="id long, partial double")
        return partials.groupBy("id").agg(F.sum("partial").alias("gathered"))

    gather = gather_csr if mode == "csr" else gather_dataframe

    upd = f"{RESET_PROB} + {damping} * coalesce(gathered, 0.0)"

    if chain_depth > 1 and mode == "dataframe":
        # each chained round touches the previous state exactly ONCE
        # (out_deg comes from the static table -> linear plan).
        def one_round(s: DataFrame) -> DataFrame:
            contrib = (
                edges.join(
                    s.join(static.hint("shuffle_hash"), "id")
                    .filter("out_deg > 0")
                    .selectExpr("id", "rank / out_deg AS c")
                    .hint("shuffle_hash"),
                    edges.src == F.col("id"),
                )
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum("c").alias("gathered"))
            )
            return static.join(contrib.hint("shuffle_hash"), "id", "left") \
                .selectExpr("id", f"{upd} AS rank")

        def step(g: Graph, state: DataFrame, i: int):
            s = state.select("id", "rank")
            for _ in range(chain_depth):
                s = one_round(s)
            # delta vs the chain START (state is materialized, so this
            # second reference is a cache read, not a recompute)
            new_state = s.join(
                state.selectExpr("id", "rank AS _prev").hint("shuffle_hash"),
                "id",
            ).selectExpr("id", "rank", "abs(rank - _prev) AS delta")
            return new_state, None
    elif mode == "dataframe":
        def step(g: Graph, state: DataFrame, i: int):
            contrib = gather(state).hint("shuffle_hash")
            new_state = state.join(contrib, "id", "left").selectExpr(
                "id",
                f"{upd} AS rank",
                f"abs(({upd}) - rank) AS delta",
            )
            return new_state, None
    else:
        def step(g: Graph, state: DataFrame, i: int):
            contrib = gather(state).hint("shuffle_hash")
            new_state = state.join(contrib, "id", "left").selectExpr(
                "id",
                f"{upd} AS rank",
                "out_deg",
                f"abs(({upd}) - rank) AS delta",
            )
            return new_state, None

    # convergence is observed on the superstep's own materialization
    # job (DataFrame.observe -> accumulators): zero extra jobs/scans.
    def observe_aggs():
        return [
            F.sum(F.when(F.col("delta") > tol, 1).otherwise(0))
            .cast("long").alias("active"),
            F.max("delta").alias("metric"),
        ]

    # Resume guard: checkpoints written before the slim-state change
    # carry out_deg; selecting the mode's exact columns both normalizes
    # old wide checkpoints (dataframe mode) and fails FAST with a clear
    # message when the checkpoint can't serve this mode (csr needs
    # out_deg, which a slim checkpoint doesn't have).
    state_cols = (
        ["id", "rank", "delta"] if mode == "dataframe"
        else ["id", "rank", "out_deg", "delta"]
    )

    def resume_transform(df: DataFrame) -> DataFrame:
        missing = [c for c in state_cols if c not in df.columns]
        if missing:
            raise ValueError(
                f"resumed checkpoint columns {df.columns} are incompatible "
                f"with pagerank mode={mode!r}: missing {missing} "
                "(checkpoint written by a different state layout?)"
            )
        return df.select(*state_cols)

    # max_iterations is in ROUNDS; run_gas counts chains
    max_chains = -(-max_iterations // chain_depth)
    result = run_gas(
        graph,
        init,
        step,
        observe_aggs=observe_aggs,
        tol=tol,
        max_iterations=max_chains,
        checkpoint=checkpoint,
        checkpoint_interval=checkpoint_interval,
        check_interval=check_interval,
        plan_hook=plan_hook,
        resume=resume,
        resume_transform=resume_transform,
        audit_shuffle=audit_shuffle,
        verbose=verbose,
    )
    if static is not None:
        # restore the public state contract (id, rank, out_deg, delta):
        # one |V|-row co-partitioned join, materialized so callers can
        # collect after the caches below are released.
        result.state = (
            result.state.join(static.hint("shuffle_hash"), "id")
            .select("id", "rank", "out_deg", "delta")
            .localCheckpoint(eager=True)
        )
        static.unpersist()
    edges.unpersist()
    return result


def pagerank_weighted(
    graph: Graph,
    weight_col: str = "weight",
    tol: float = 1e-6,
    max_iterations: int = 200,
    damping: float = 0.85,
    checkpoint: CheckpointStore | None = None,
    checkpoint_interval: int = 1,
    check_interval: int = 1,
    resume: bool = False,
    verbose: bool = False,
) -> GASResult:
    """Weighted PageRank: an out-edge contributes rank * w / Σ_out w
    instead of rank / out_degree — the natural ranking for edge tables
    carrying multiplicities, e.g. the host graph's link counts
    (webtext.urls.host_graph). Reduces exactly to :func:`pagerank`
    when every weight is 1 (differential-tested). The reference's
    pagerank is unweighted (pagerank.cpp:99-106); this extends the
    toolkit with the flagship's plan discipline intact: slim
    (id, rank, delta) state, a static (id, wout) cache, zero-exchange
    shuffle-hash joins, observe-fused convergence, one
    materialization per superstep. Vertices with non-positive total
    out-weight are dangling (contribute nothing). Weights must be
    pre-aggregated to ONE row per (src, dst) — Graph.from_edges dedups
    pairs, so duplicate-pair weight rows never reach this function
    intact (host_graph output already satisfies this). Returns state
    (id, rank, wout, delta)."""
    P = graph.num_partitions
    edges = (
        graph.edges.select(
            "src", "dst", F.col(weight_col).cast("double").alias("w")
        )
        .repartition(P, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges.count()

    wout = edges.groupBy(F.col("src").alias("id")).agg(
        F.sum("w").alias("wout")
    )
    static = (
        graph.vertices.select("id")
        .join(wout.hint("shuffle_hash"), "id", "left")
        .select("id", F.coalesce("wout", F.lit(0.0)).alias("wout"))
        .repartition(P, "id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    static.count()
    init = static.select(
        "id", F.lit(1.0).alias("rank"), F.lit(float("inf")).alias("delta")
    )

    upd = f"{RESET_PROB} + {damping} * coalesce(gathered, 0.0)"

    def step(g: Graph, state: DataFrame, i: int):
        contrib = (
            edges.join(
                state.join(static.hint("shuffle_hash"), "id")
                .filter("wout > 0")
                .selectExpr("id", "rank / wout AS c")
                .hint("shuffle_hash"),
                edges.src == F.col("id"),
            )
            .selectExpr("dst", "w * c AS wc")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("wc").alias("gathered"))
        )
        new_state = state.join(
            contrib.hint("shuffle_hash"), "id", "left"
        ).selectExpr(
            "id", f"{upd} AS rank", f"abs(({upd}) - rank) AS delta"
        )
        return new_state, None

    def observe_aggs():
        return [
            F.sum(F.when(F.col("delta") > tol, 1).otherwise(0))
            .cast("long").alias("active"),
            F.max("delta").alias("metric"),
        ]

    result = run_gas(
        graph,
        init,
        step,
        observe_aggs=observe_aggs,
        tol=tol,
        max_iterations=max_iterations,
        checkpoint=checkpoint,
        checkpoint_interval=checkpoint_interval,
        check_interval=check_interval,
        resume=resume,
        verbose=verbose,
    )
    result.state = (
        result.state.join(static.hint("shuffle_hash"), "id")
        .select("id", "rank", "wout", "delta")
        .localCheckpoint(eager=True)
    )
    static.unpersist()
    edges.unpersist()
    return result


def personalized_pagerank(
    graph: Graph,
    sources,
    tol: float = 1e-6,
    max_iterations: int = 200,
    damping: float = 0.85,
    checkpoint: CheckpointStore | None = None,
    checkpoint_interval: int = 1,
    check_interval: int = 1,
    resume: bool = False,
    verbose: bool = False,
) -> GASResult:
    """Personalized (topic-sensitive) PageRank: the reset mass lands
    only on ``sources`` (list of vertex ids, or a DataFrame with an
    ``id`` column) — r = reset + damping * Aᵀ r with
    reset(v) = RESET_PROB·1[v ∈ S], the unnormalized analog of the
    reference's uniform reset (pagerank.cpp:99-106; uniform S = every
    vertex recovers standard pagerank ranks exactly). Standard
    link-graph primitive for seed-relative relevance (crawl frontier
    scoring, related-page ranking). Same plan discipline as the
    flagship: slim state, static (id, out_deg, is_src) cache,
    zero-exchange shuffle-hash joins, observe-fused convergence.
    Returns state (id, rank, out_deg, delta)."""
    P = graph.num_partitions
    edges = (
        graph.edges.select("src", "dst")
        .repartition(P, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges.count()

    out_deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    base = graph.vertices.select("id").join(
        out_deg.hint("shuffle_hash"), "id", "left"
    )
    if isinstance(sources, DataFrame):
        flag = sources.select("id").distinct().withColumn(
            "is_src", F.lit(True)
        )
        base = base.join(flag.hint("shuffle_hash"), "id", "left")
        src_expr = F.coalesce("is_src", F.lit(False))
    else:
        src_expr = F.col("id").isin([int(s) for s in sources])
    static = (
        base.select(
            "id",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            src_expr.alias("is_src"),
        )
        .repartition(P, "id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    static.count()

    # explicit DOUBLE casts: bare 0.15/0.0 literals parse as DECIMAL
    # in selectExpr and would leak decimal.Decimal into the rank column
    reset = (
        f"CASE WHEN is_src THEN CAST({RESET_PROB} AS DOUBLE)"
        " ELSE CAST(0.0 AS DOUBLE) END"
    )
    # is_src rides IN the state row (one boolean) so apply is a single
    # state ⋈ contrib join — the flagship's exact superstep shape. An
    # earlier draft joined static AND state in apply (state re-entering
    # the plan through an extra aliased branch) and hit the geometric
    # origin-chain blowup truncate_plan documents: measured 0.4 -> 1.4
    # -> 3.5 -> 8.4 -> 22 -> 59 s/superstep by step 24 on a 5-vertex
    # fixture. The flagship shape stays flat for 100+ supersteps.
    init = static.select(
        "id",
        "is_src",
        F.expr(reset).alias("rank"),
        F.lit(float("inf")).alias("delta"),
    )
    upd = f"({reset}) + {damping} * coalesce(gathered, 0.0)"

    def step(g: Graph, state: DataFrame, i: int):
        contrib = (
            edges.join(
                state.join(static.hint("shuffle_hash"), "id")
                .filter("out_deg > 0")
                .selectExpr("id", "rank / out_deg AS c")
                .hint("shuffle_hash"),
                edges.src == F.col("id"),
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("c").alias("gathered"))
        )
        new_state = state.join(
            contrib.hint("shuffle_hash"), "id", "left"
        ).selectExpr(
            "id",
            "is_src",
            f"{upd} AS rank",
            f"abs(({upd}) - rank) AS delta",
        )
        return new_state, None

    def observe_aggs():
        return [
            F.sum(F.when(F.col("delta") > tol, 1).otherwise(0))
            .cast("long").alias("active"),
            F.max("delta").alias("metric"),
        ]

    result = run_gas(
        graph,
        init,
        step,
        observe_aggs=observe_aggs,
        tol=tol,
        max_iterations=max_iterations,
        checkpoint=checkpoint,
        checkpoint_interval=checkpoint_interval,
        check_interval=check_interval,
        resume=resume,
        verbose=verbose,
    )
    result.state = (
        result.state.join(static.hint("shuffle_hash"), "id")
        .select("id", "rank", "out_deg", "delta")
        .localCheckpoint(eager=True)
    )
    static.unpersist()
    edges.unpersist()
    return result


def total_rank(state: DataFrame) -> float:
    """map_reduce_vertices(total_rank) self-check (pagerank.cpp:257-258)."""
    return float(state.agg(F.sum("rank")).first()[0])


def _delta_base_step(edges: DataFrame, tol: float, damping: float):
    """Additive instantiation of the ENGINE-level gather-cache factory
    (gas.make_delta_step): acc is the cached gather, the emission is
    the increment since last send, receivers fold deltas with SUM.
    Shared by pagerank_delta (cold start) and pagerank_warm_start."""
    from ..gas import make_delta_step

    return make_delta_step(
        edges,
        frontier_pred="changed AND out_deg > 0",
        emit_expr="rank / out_deg - sent",
        monoid="sum",
        merge_exprs={
            "rank": f"{RESET_PROB} + {damping} * (acc + coalesce(din, 0.0))",
            "out_deg": "out_deg",
            "acc": "acc + coalesce(din, 0.0)",
            # emission updates `sent` for this step's frontier
            "sent": "CASE WHEN changed AND out_deg > 0 THEN rank / out_deg "
                    "ELSE sent END",
            # re-signal on cumulative un-sent change (gather-cache
            # safe accumulation), dangling vertices never signal
            "changed": "CASE WHEN out_deg > 0 THEN "
                       f"abs(({RESET_PROB} + {damping} * "
                       "(acc + coalesce(din, 0.0))) "
                       "- (CASE WHEN changed THEN rank / out_deg ELSE sent "
                       f"END) * out_deg) > {tol} ELSE false END",
        },
    )


def pagerank_delta(
    graph: Graph,
    tol: float = 1e-6,
    max_iterations: int = 500,
    damping: float = 0.85,
    checkpoint: CheckpointStore | None = None,
    checkpoint_interval: int = 1,
    check_interval: int = 1,
    verbose: bool = False,
) -> GASResult:
    """Delta / dynamic PageRank — the reference's gather-cache +
    post_delta path (synchronous_engine.hpp:1589-1643 caches the
    gather; pagerank.cpp:124-135 scatters only when |delta| > TOLERANCE
    and posts the contribution delta to the neighbor's cache).

    State: (id, rank, out_deg, acc, sent, changed)
      acc  = cached gather sum (the reference's gather_cache entry)
      sent = contribution (rank/out_deg) at this vertex's LAST emission
    Per superstep only the CHANGED frontier emits
      d = rank/out_deg - sent
    and receivers fold d into acc:  rank' = 0.15 + 0.85 * acc'.
    Re-emission is anchored on cumulative un-sent change
    (|rank' - sent' * out_deg| > tol), so sub-tol drips accumulate and
    eventually re-signal instead of being silently dropped.

    At web scale this is the difference between touching the shrinking
    frontier and touching |V| every superstep for slowly-converging
    tails. Differential-tested against dense pagerank (allclose 1e-6);
    per-superstep frontier sizes land in GASResult.metrics (active),
    giving the fewer-rows-touched evidence directly.
    """
    P = graph.num_partitions
    edges = (
        graph.edges.select("src", "dst")
        .repartition(P, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges.count()
    out_deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    init = (
        graph.vertices.select("id")
        .join(out_deg, "id", "left")
        .selectExpr(
            "id",
            "CAST(1.0 AS DOUBLE) AS rank",  # SQL 1.0 is DECIMAL, not double
            "coalesce(out_deg, 0) AS out_deg",
            "CAST(0.0 AS DOUBLE) AS acc",
            "CAST(0.0 AS DOUBLE) AS sent",
            "coalesce(out_deg, 0) > 0 AS changed",
        )
        .repartition(P, "id")
    )

    base_step = _delta_base_step(edges, tol, damping)

    def step(g: Graph, state: DataFrame, i: int):
        new_state, _ = base_step(g, state, i)
        return new_state, lambda df: df.filter("changed").select("id")

    result = run_gas(
        graph,
        init,
        step,
        observe_aggs=lambda: [
            F.sum(F.col("changed").cast("long")).alias("active")
        ],
        max_iterations=max_iterations,
        checkpoint=checkpoint,
        checkpoint_interval=checkpoint_interval,
        check_interval=check_interval,
        verbose=verbose,
    )
    edges.unpersist()
    return result


def pagerank_warm_start(
    graph: Graph,
    prev_state: DataFrame,
    new_edges: DataFrame,
    tol: float = 1e-6,
    max_iterations: int = 500,
    damping: float = 0.85,
    checkpoint: CheckpointStore | None = None,
    checkpoint_interval: int = 1,
    check_interval: int = 1,
    verbose: bool = False,
) -> GASResult:
    """Incremental PageRank: continue a converged ``pagerank_delta``
    state after new edges were appended (e.g. by the streaming crawl
    ingest, streaming.py stream_pages_to_edges) instead of cold-starting
    on the grown graph. This is the reference's dynamic scheduling
    (synchronous_engine.hpp:1589-1643, gather cache + post_delta)
    applied ACROSS runs — the capability a continuously-crawling
    deployment needs: only vertices touched by the new edges (and the
    decaying ripple around them) recompute, not |V|.

    Seed construction (the correctness-critical bookkeeping):
    - ``acc`` must equal the sum of the CURRENT graph's in-neighbors'
      last emissions. Old edges already delivered ``sent``; for each
      NEW edge u->v the source's standing emission is folded into v's
      cache once (the post_delta an edge insertion owes its target).
    - out-degree changes make a source's standing emission stale
      (``sent != rank/out_deg'``); the uniform re-signal criterion
      |rank - sent*out_deg'| > tol catches exactly those sources, new
      vertices, and corrected targets — unchanged vertices stay idle.

    ``graph`` is the UPDATED graph (all edges); ``prev_state`` the
    converged delta state (id, rank, out_deg, acc, sent, ...);
    ``new_edges`` (src, dst) must be the genuinely-new edges (not in
    the previous graph — anti-join the sink against the old edge table
    when shards may overlap). Converges to the same fixpoint as a cold
    run on the updated graph (differential-tested allclose 1e-6) in
    fewer supersteps and far fewer touched rows.
    """
    P = graph.num_partitions
    edges = (
        graph.edges.select("src", "dst")
        .repartition(P, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges.count()
    out_deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    prev = prev_state.select("id", "acc", "sent")
    # one-time cache corrections: each new edge u->v owes v the source's
    # standing emission (sources absent from prev_state are new vertices
    # with sent=0 — nothing owed)
    corr = (
        new_edges.select("src", "dst")
        .join(prev.selectExpr("id AS src", "sent AS _s"), "src")
        .groupBy(F.col("dst").alias("id"))
        .agg(F.sum("_s").alias("corr"))
    )
    init = (
        graph.vertices.select("id")
        .join(out_deg, "id", "left")
        .join(prev, "id", "left")
        .join(corr, "id", "left")
        .selectExpr(
            "id",
            "coalesce(out_deg, 0) AS out_deg",
            "coalesce(acc, CAST(0.0 AS DOUBLE)) + "
            "coalesce(corr, CAST(0.0 AS DOUBLE)) AS acc",
            "coalesce(sent, CAST(0.0 AS DOUBLE)) AS sent",
        )
        .selectExpr(
            "id",
            f"{RESET_PROB} + {damping} * acc AS rank",
            "out_deg",
            "acc",
            "sent",
            f"out_deg > 0 AND abs(({RESET_PROB} + {damping} * acc) "
            f"- sent * out_deg) > {tol} AS changed",
        )
        .repartition(P, "id")
    )

    base_step = _delta_base_step(edges, tol, damping)

    def step(g: Graph, state: DataFrame, i: int):
        new_state, _ = base_step(g, state, i)
        return new_state, lambda df: df.filter("changed").select("id")

    result = run_gas(
        graph,
        init,
        step,
        observe_aggs=lambda: [
            F.sum(F.col("changed").cast("long")).alias("active")
        ],
        max_iterations=max_iterations,
        checkpoint=checkpoint,
        checkpoint_interval=checkpoint_interval,
        check_interval=check_interval,
        verbose=verbose,
    )
    edges.unpersist()
    return result
