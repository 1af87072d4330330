"""Corpus-level cleaning operators for LLM training-data pipelines.

Three families, all Spark-first:

- ``line_dedup``: cross-document duplicated-line removal (CCNet /
  RefinedWeb-style).  The only corpus-wide state is the md5 line key;
  lines shuffle once to count occurrences and once more (co-partitioned
  on the same key) to join the verdict back, then re-assemble per doc.
- ``c4_line_filter``: C4-style per-line heuristics (Raffel et al. 2020,
  public): terminal punctuation, minimum words, marker-phrase drops,
  plus document-level lorem-ipsum / brace / min-lines rules.  Pure JVM
  array expressions — zero shuffles, zero Python.
- ``hash_split`` / ``quality_sample``: deterministic md5-uniform
  train/val/test assignment and quality-weighted Bernoulli sampling.
  Same draw on any cluster size or partitioning, replayable in SQL.

The reference engine has no text pipeline (its payload is the link
graph); these extend the capability surface per the graft mandate and
reuse its determinism discipline (cf. warp.py bond percolation's
md5-seeded draws, toolkits/graph_analytics/warp_bond_percolation.cpp).

Scale notes (100 TB posture):
- ``line_dedup`` groups by the 128-bit md5 of the line, never the line
  text, so the count shuffle carries (key, id, pos) rows only; the
  verdict join is key-co-partitioned with the count aggregation (one
  exchange reused).  Document re-assembly is the final groupBy on the
  doc id — the same key the corpus is already stored by.
- ``c4_line_filter`` never leaves the row: per-doc line arrays are
  filtered with ``F.filter`` lambdas inside whole-stage codegen.
- ``hash_split`` / ``quality_sample`` are stateless projections —
  no shuffle, no driver state, trivially resumable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "split_lines",
    "line_dedup",
    "c4_line_filter",
    "hash_split",
    "quality_sample",
]


def split_lines(col: Column) -> Column:
    """Trimmed, non-empty lines of a text column (array<string>)."""
    segs = F.transform(F.split(col, "\n"), lambda x: F.trim(x))
    return F.filter(segs, lambda x: x != "")


def _md5_uniform(expr: str) -> Column:
    """Deterministic uniform [0,1) from the first 8 md5 hex nibbles of
    a SQL string expression — the same draw the GAS toolkits use
    (als.py:121, cascades.py:76) and DuckDB replays nibble-by-nibble."""
    return F.expr(
        f"CAST(conv(substring(md5({expr}), 1, 8), 16, 10) AS DOUBLE)"
        " / CAST(4294967296 AS DOUBLE)"
    )


# ------------------------------------------------ cross-doc line dedup
def line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove corpus-wide duplicated lines, keeping only the globally
    FIRST occurrence of each line (ordered by (id, line position) —
    deterministic under any partitioning).  Unique lines always stay.

    Returns one row per input doc: (id_col, n_lines, n_kept,
    text_clean) where text_clean re-joins the surviving trimmed lines
    with newlines in their original order ('' if nothing survives).
    """
    lines = docs.select(
        F.col(id_col).alias("__id"),
        F.posexplode(split_lines(F.col(text_col))).alias("__pos", "__line"),
    ).withColumn("__k", F.md5("__line"))

    # one hash-partition by the line key serves both the count and the
    # first-occurrence minimum; struct min is lexicographic (id, pos)
    verdict = lines.groupBy("__k").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.min(F.struct(F.col("__id"), F.col("__pos"))).alias("__first"),
    )
    kept = (
        lines.join(verdict.hint("shuffle_hash"), "__k")
        .where(
            (F.col("__cnt") == 1)
            | (
                (F.col("__id") == F.col("__first.__id"))
                & (F.col("__pos") == F.col("__first.__pos"))
            )
        )
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__pos", "__line"))
                    ),
                    lambda s: s["__line"],
                ),
                "\n",
            ).alias("text_clean"),
        )
    )
    base = docs.select(
        F.col(id_col),
        F.size(split_lines(F.col(text_col))).cast("long").alias("n_lines"),
    )
    return (
        base.join(kept, base[id_col] == kept["__id"], "left")
        .select(
            id_col,
            "n_lines",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        )
    )


# -------------------------------------------------- C4-style filtering
C4_LINE_MARKERS = ["javascript", "cookie policy", "terms of use"]
C4_DOC_MARKERS = ["lorem ipsum", "{"]
_TERMINAL = ('.', '!', '?', '"')


def _line_ok(line: Column, min_words: int) -> Column:
    words = F.size(F.split(line, r"[ \t]+"))
    ends = F.substring(line, -1, 1).isin(*_TERMINAL)
    lower = F.lower(line)
    marked = F.lit(False)
    for m in C4_LINE_MARKERS:
        marked = marked | lower.contains(m)
    return (words >= F.lit(min_words)) & ends & ~marked


def c4_line_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    min_lines: int = 3,
) -> DataFrame:
    """C4 cleaning rules (documented instantiation of Raffel et al.
    2020 §2.2, public): keep a line iff it has >= min_words whitespace
    words, ends in terminal punctuation (. ! ? \"), and contains none
    of C4_LINE_MARKERS (lowercased); keep a doc iff >= min_lines lines
    survive and the lowercased text contains none of C4_DOC_MARKERS.

    Pure projection — per-doc line arrays filtered in whole-stage
    codegen; no shuffle, no Python.  Returns (id_col, n_lines, n_kept,
    kept, text_clean).
    """
    ls = split_lines(F.col(text_col))
    kept_ls = F.filter(ls, lambda x: _line_ok(x, min_words))
    lower = F.lower(F.col(text_col))
    doc_marked = F.lit(False)
    for m in C4_DOC_MARKERS:
        doc_marked = doc_marked | lower.contains(m)
    n_kept = F.size(kept_ls).cast("long")
    return docs.select(
        F.col(id_col),
        F.size(ls).cast("long").alias("n_lines"),
        n_kept.alias("n_kept"),
        ((n_kept >= F.lit(min_lines)) & ~doc_marked).alias("kept"),
        F.array_join(kept_ls, "\n").alias("text_clean"),
    )


# --------------------------------------- deterministic splits/sampling
def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "split",
    fractions: dict[str, float] | None = None,
) -> DataFrame:
    """Assign each row to a named split by a deterministic md5-uniform
    draw on (seed, id).  Stateless projection: the same row lands in
    the same split on any cluster size, partitioning, or re-run, and
    new rows never reshuffle old assignments (the property a continuous
    crawl needs).  Adds a ``split`` column.
    """
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    u = _md5_uniform(f"concat('{seed}:', CAST({id_col} AS STRING))")
    expr: Column | None = None
    acc = 0.0
    names = list(fractions.items())
    for name, frac in names[:-1]:
        acc += frac
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = names[-1][0]
    split = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", split)


def quality_sample(
    docs: DataFrame,
    weight: Column,
    id_col: str = "doc_id",
    seed: str = "qsample",
) -> DataFrame:
    """Keep each row independently with probability = weight (clamped
    to [0,1]), via the same deterministic md5-uniform draw.  Weighted
    downsampling by quality score without global state or RNG order
    dependence.  Adds ``u`` (the draw) and keeps rows with u < weight.
    """
    u = _md5_uniform(f"concat('{seed}:', CAST({id_col} AS STRING))")
    w = F.least(F.greatest(weight, F.lit(0.0)), F.lit(1.0))
    return (
        docs.withColumn("u", u)
        .withColumn("w", w)
        .where(F.col("u") < F.col("w"))
    )


def stratified_sample(
    docs: DataFrame,
    strata_col: str,
    n_per: int,
    id_col: str = "doc_id",
    seed: str = "strat",
) -> DataFrame:
    """Exactly ``n_per`` rows per stratum (fewer if the stratum is
    smaller), selected by the smallest deterministic md5-uniform draws
    keyed on (seed, id) — i.e. a per-stratum uniform sample WITHOUT
    replacement that is reproducible at any parallelism and stable
    per-row under corpus growth within a stratum only up to the
    cutoff (classic bottom-k sampling). Adds ``u`` (the draw).

    Scale shape: rank-over-window with rank <= k compiles to Spark
    4.1's WindowGroupLimit — each task keeps a per-stratum top-k
    heap BEFORE the shuffle, so only P*k rows per stratum move, not
    the corpus."""
    u = _md5_uniform(f"concat('{seed}:', CAST({id_col} AS STRING))")
    w = Window.partitionBy(strata_col).orderBy("u", id_col)
    return (
        docs.withColumn("u", u)
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= n_per)
        .drop("__rk")
    )


def mixture_quotas(weights: dict[str, float], n: int) -> dict[str, int]:
    """Largest-remainder (Hamilton) apportionment of ``n`` slots over
    normalized ``weights`` — driver-side arithmetic on the weights
    dict only. Ties on remainder break by stratum name ascending."""
    total = float(sum(weights.values()))
    if total <= 0 or n < 0:
        raise ValueError("weights must sum > 0 and n >= 0")
    exact = {k: n * w / total for k, w in weights.items()}
    quota = {k: int(v) for k, v in exact.items()}
    left = n - sum(quota.values())
    order = sorted(
        weights, key=lambda k: (-(exact[k] - quota[k]), k)
    )
    for k in order[:left]:
        quota[k] += 1
    return quota


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, float],
    n: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Deterministic domain-mixture selection: apportion ``n`` slots
    across strata by largest-remainder on ``weights`` (strata not in
    the dict get zero), then fill each stratum's quota with the same
    bottom-k md5 draws as stratified_sample. Undersized strata yield
    fewer rows than their quota (no backfilling — the mixture is a
    cap, matching how training-mixture configs are specified).

    Scale shape: the rank <= max_quota window filter compiles to
    WindowGroupLimit (per-task top-k BEFORE the shuffle); the
    per-stratum quota refinement is then a constant map lookup. Adds
    ``u`` (the draw)."""
    quota = mixture_quotas(weights, n)
    if not quota:
        return docs.limit(0).withColumn("u", F.lit(0.0))
    max_q = max(quota.values())
    qmap = F.create_map(
        *[F.lit(x) for kv in sorted(quota.items()) for x in kv]
    )
    u = _md5_uniform(f"concat('{seed}:', CAST({id_col} AS STRING))")
    w = Window.partitionBy(strata_col).orderBy("u", id_col)
    return (
        docs.withColumn("u", u)
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= max_q)  # WindowGroupLimit prune
        .where(
            F.col("__rk")
            <= F.coalesce(qmap[F.col(strata_col)], F.lit(0))
        )
        .drop("__rk")
    )


# ---------------------------------------------------- sequence packing
def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    n_shards: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences by
    streaming contiguous packing: within a shard, docs are taken in id
    order and a doc starts in bin floor(preceding_tokens / budget) —
    the greedy "open a new sequence when the budget is crossed" rule,
    deterministic and SQL-replayable.

    Scale shape: the running sum is a window partitioned by shard
    (shard = id mod n_shards), NEVER a global window — each shard's
    prefix sum is one partition-local sort, so 100 TB packs with
    n_shards-way parallelism and no single-task bottleneck. Docs
    longer than the budget get bins to themselves (they straddle bin
    boundaries; a downstream tokenizer truncates or splits).

    Returns (id_col, shard, bin, n_tokens) — (shard, bin) is the
    sequence key.
    """
    from pyspark.sql import Window

    from .text import token_count

    toks = token_count(F.col(text_col))
    base = docs.select(
        F.col(id_col),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("shard"),
        toks.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return base.select(
        id_col,
        "shard",
        F.floor((cum - F.col("n_tokens")) / budget)
        .cast("long")
        .alias("bin"),
        "n_tokens",
    )
