"""AdPredictor — Bayesian probit click-through-rate model (Graepel
et al., ICML 2010) on the GAS runtime.

Reference: /root/reference/toolkits/collaborative_filtering/adpredictor.cpp
- bipartite graph: samples (rows, out-edges, label y in {-1, +1}) x
  features (columns, negated id space, in-edges); every edge has
  x_ij = 1 (:121, :306-360 loader).
- feature state: Gaussian weight belief (mu in xT_mu, variance in
  sigma; prior mu = 0, sigma = 1, :45-63).
- per iteration (:449-460) two synchronous parfor phases:
  PHASE1 (:200-246, per sample, OUT edges):
      S_i = sum_j sigma_j ; M_i = sum_j mu_j
  (the beta*beta seed is overwritten by the gather sum, :214-218 —
  mirrored as-is), plus error/likelihood stats with
  prob = phi(M_i * y_i / beta) (:176-189).
  PHASE2 (:248-254 via :228-246 map2, per feature, IN edges): with
      t_i = y_i * M_i / sqrt(S_i)
      mu_j    += sum_i (y_i * sigma_j / sqrt(S_i)) * v(t_i)
      sigma_j *= prod_i (1 - (sigma_j / S_i) * w(t_i))
  where v(t) = N(0,1)(t) / phi(t) (phi floored at 1e-5 when it
  underflows to 0, :128-131) and w(t) = v(t) * (v(t) + t) (:140-143);
  the reference applies NO role filter in PHASE2 (map2 gathers every
  in-edge) — mirrored.
- phi is the Abramowitz-Stegun 7.1.26 polynomial CDF (cdf.hpp:27-48)
  and the normalization constant uses the reference's truncated
  pi = 3.14159265 (:36-37) — both mirrored EXACTLY so the DuckDB
  oracle replays the model bit-for-bit.

Spark mapping (100 TB shape): both phases are pure-JVM scatter joins
(feature beliefs resp. sample summaries onto the persisted edge
table) + partial-agg sums by the other endpoint; the PHASE2 variance
product is exp(sum(ln(factor))) so it rides the same hash
aggregation. Only (id, scalar-state) rows shuffle. The reference's
parfor phases are already synchronous, so the BSP loop is faithful,
not just determinized.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..gas import truncate_plan
from ..graph import Graph
from .als import SAFE_NEG_OFFSET, item_vid

# cdf.hpp:27-33 (A&S 7.1.26) and adpredictor.cpp:36-37 (truncated pi)
PHI_A1 = 0.254829592
PHI_A2 = -0.284496736
PHI_A3 = 1.421413741
PHI_A4 = -1.453152027
PHI_A5 = 1.061405429
PHI_P = 0.3275911
REF_PI = 3.14159265


def phi_col(x: Column) -> Column:
    """Standard normal CDF, cdf.hpp:35-48 — sign split + the 7.1.26
    polynomial in t = 1/(1 + p*|x|/sqrt(2))."""
    z = F.abs(x) / F.sqrt(F.lit(2.0))
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(PHI_P) * z)
    poly = (
        ((((F.lit(PHI_A5) * t + F.lit(PHI_A4)) * t) + F.lit(PHI_A3)) * t
         + F.lit(PHI_A2)) * t + F.lit(PHI_A1)
    ) * t
    y = F.lit(1.0) - poly * F.exp(-z * z)
    sign = F.when(x < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    return F.lit(0.5) * (F.lit(1.0) + sign * y)


def _v_col(t: Column) -> Column:
    """v(t) = N(t) / phi(t), phi floored at 1e-5 on underflow
    (adpredictor.cpp:128-136)."""
    p = phi_col(t)
    p = F.when(p == 0.0, F.lit(1e-5)).otherwise(p)
    gn = F.lit(1.0) / F.sqrt(F.lit(2.0 * REF_PI))
    return gn * F.exp(-t * t / F.lit(2.0)) / p


def adpredictor_graph(
    samples: DataFrame,
    num_partitions: int | None = None,
    sample_col: str = "sample",
    feature_col: str = "feature",
    label_col: str = "y",
    role_col: str | None = None,
) -> Graph:
    """Bipartite AdPredictor graph: src = sample id (carrying its
    +-1 label and role on every edge), dst = negated feature id —
    the ALS id-space convention (adpredictor.cpp:342-357)."""
    e = samples.select(
        F.col(sample_col).cast("long").alias("src"),
        item_vid(F.col(feature_col)).alias("dst"),
        F.col(label_col).cast("int").alias("y"),
        (F.col(role_col) if role_col is not None else F.lit("train"))
        .alias("role"),
    )
    return Graph.from_edges(e, num_partitions=num_partitions)


@dataclass
class AdPredictorResult:
    feature_weights: DataFrame  # (id, mu, sigma) — original feature ids
    sample_scores: DataFrame    # (id, y, role, score, sigma, prob)
    iterations: int


def adpredictor(
    graph: Graph,
    beta: float = 1.0,  # adpredictor.cpp:38 + --beta
    max_iterations: int = 10,
    verbose: bool = False,
) -> AdPredictorResult:
    """Run AdPredictor message passing for the reference's fixed
    iteration count (adpredictor.cpp:449-460). Returns the feature
    weight posteriors and the final per-sample scores
    (score = M_i = x^T mu, prob = phi(score * y / beta))."""
    P = graph.num_partitions
    edges = graph.edges.select("src", "dst", "y", "role").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    edges.count()

    # feature beliefs: prior mu = 0, sigma = 1 (adpredictor.cpp:57-63)
    feats = truncate_plan(
        edges.select(F.col("dst").alias("id")).distinct()
        .repartition(P, "id")
        .select("id", F.lit(0.0).alias("mu"), F.lit(1.0).alias("sigma"))
    )
    rows = None
    it = 0
    for it in range(1, max_iterations + 1):
        # PHASE1: per-sample sums over its features
        rows = truncate_plan(
            edges.join(
                feats.selectExpr("id AS dst", "mu AS _m", "sigma AS _s")
                .hint("shuffle_hash"),
                "dst",
            )
            .groupBy(F.col("src").alias("id"))
            .agg(
                F.max("y").alias("y"),
                F.max("role").alias("role"),
                F.sum("_m").alias("M"),
                F.sum("_s").alias("S"),
            )
        )
        # PHASE2: per-feature posterior update (no role filter —
        # adpredictor.cpp map2 gathers every in-edge). The reference
        # computes each factor WITH the feature's current sigma_j in
        # the map and multiplies in the combiner (:240-246, :165-169);
        # here sigma_j joins onto the edges and the product becomes
        # exp(sum(ln(factor))) — a plain hash agg, no per-feature list.
        t = F.col("_ry") * F.col("M") / F.sqrt(F.col("S"))
        v = _v_col(t)
        w = v * (v + t)
        contrib = (
            edges.join(
                rows.selectExpr("id AS src", "y AS _ry", "M", "S")
                .hint("shuffle_hash"),
                "src",
            )
            .join(
                feats.selectExpr("id AS dst", "sigma AS _sj")
                .hint("shuffle_hash"),
                "dst",
            )
            .select(
                F.col("dst").alias("id"),
                (F.col("_ry") / F.sqrt(F.col("S")) * v).alias("mu_c"),
                # factor > 0 is the reference's hard assert (:243-246);
                # it CAN fail for single-feature samples (sigma_j/S = 1)
                # under the A&S phi approximation error because the
                # reference drops the beta^2 term from S (:214-218) —
                # fail loudly like the reference instead of letting
                # log(<=0) NULL-propagate into a silent wrong sum.
                F.when(
                    F.lit(1.0) - F.col("_sj") / F.col("S") * w <= 0.0,
                    F.raise_error(F.lit(
                        "adpredictor: non-positive variance factor "
                        "(adpredictor.cpp:243 assert) — sample with "
                        "sigma_j ~ S and extreme surprise; add more "
                        "features per sample or shrink the prior"
                    )),
                ).otherwise(
                    F.log(F.lit(1.0) - F.col("_sj") / F.col("S") * w)
                ).alias("ln_f"),
            )
            .groupBy("id")
            .agg(
                F.sum("mu_c").alias("mu_sum"),
                F.sum("ln_f").alias("ln_sum"),
            )
        )
        feats = truncate_plan(
            feats.join(contrib.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                F.when(
                    F.col("mu_sum").isNotNull(),
                    F.col("mu") + F.col("sigma") * F.col("mu_sum"),
                ).otherwise(F.col("mu")).alias("mu"),
                F.when(
                    F.col("ln_sum").isNotNull(),
                    F.col("sigma") * F.exp(F.col("ln_sum")),
                ).otherwise(F.col("sigma")).alias("sigma"),
            )
        )
        if verbose:
            print(f"[adpredictor] iteration {it}/{max_iterations}")

    # final per-sample scores against the last beliefs
    rows = (
        edges.join(
            feats.selectExpr("id AS dst", "mu AS _m", "sigma AS _s")
            .hint("shuffle_hash"),
            "dst",
        )
        .groupBy(F.col("src").alias("id"))
        .agg(
            F.max("y").alias("y"),
            F.max("role").alias("role"),
            F.sum("_m").alias("score"),
            F.sum("_s").alias("sigma"),
        )
        .withColumn(
            "prob",
            phi_col(F.col("score") * F.col("y") / F.lit(beta)),
        )
    )
    out_feats = feats.select(
        (-F.col("id") - F.lit(SAFE_NEG_OFFSET)).alias("id"),
        "mu", "sigma",
    )
    edges.unpersist()
    return AdPredictorResult(
        feature_weights=out_feats, sample_scores=rows, iterations=it
    )
