"""Deterministic HyperLogLog-style distinct-count sketches.

Public knowledge: Flajolet, Fusy, Gandouet & Meunier, "HyperLogLog:
the analysis of a near-optimal cardinality estimation algorithm"
(AofA 2007). Spark ships approx_count_distinct (HLL++), but its
register layout is opaque to an external oracle and not exposed for
incremental merging; this variant keys every draw on the repo's
standard md5 nibbles so a SQL oracle replays it register-for-register,
and exposes the REGISTER TABLE as a first-class mergeable sketch —
the 100 TB shape: per-shard/per-day register tables are m rows per
group, merged by max(rho), never rescanning history (same role the
FM sketch plays inside approx_diameter, algorithms/approx_diameter.py).

Hash layout (documented deviation from the paper's split, equally
uniform): h = first 8 md5 hex nibbles of the key as u32; register
index = h mod m (m = 2^b); w = floor(h / m), a (32-b)-bit word;
rho = (32-b) - len(bin(w)) + 1 for w > 0 else (32-b) + 1 — all
integer-exact in both engines (bin() drops leading zeros in Spark
and DuckDB alike).

Estimator: alpha_m * m^2 / (sum 2^-rho + (m - observed)) with the
standard small-range linear-counting correction (raw <= 2.5m and
empty registers -> m * ln(m / zeros)). Every 2^-rho term is a dyadic
rational with lsb >= 2^-(33-b), so the register sum is EXACT in
float64 regardless of aggregation order — cross-engine safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _alpha(m: int) -> float:
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    b: int = 10,
) -> DataFrame:
    """Per-group HLL register table: (group_cols..., idx, rho), at
    most m = 2^b rows per group. Mergeable: the sketch of a union of
    shards is ``groupBy(group, idx).max(rho)`` over their register
    tables."""
    if not 4 <= b <= 16:
        raise ValueError("b must be in [4, 16]")
    m = 1 << b
    wbits = 32 - b
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    w = F.floor(h / m)
    rho = F.when(
        w > 0, F.lit(wbits) - F.length(F.bin(w)) + 1
    ).otherwise(F.lit(wbits + 1)).cast("int")
    return (
        df.select(
            *group_cols,
            (h % m).cast("int").alias("idx"),
            rho.alias("rho"),
        )
        .groupBy(*group_cols, "idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str],
    b: int = 10,
) -> DataFrame:
    """Cardinality estimate per group from a register table:
    (group_cols..., est) with est rounded 4dp."""
    m = 1 << b
    a = _alpha(m) * m * m
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("z"),
    )
    raw = F.lit(a) / (F.col("z") + (F.lit(m) - F.col("cnt")))
    zeros = F.lit(m) - F.col("cnt")
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(*group_cols, F.round(est, 4).alias("est"))


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    b: int = 10,
) -> DataFrame:
    """approx COUNT(DISTINCT key) per group, deterministic and
    oracle-replayable. Standard error ~ 1.04 / sqrt(2^b)."""
    return hll_estimate(
        hll_registers(df, group_cols, key_col, b=b), group_cols, b=b
    )
