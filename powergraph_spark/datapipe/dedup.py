"""Deduplication at training-data scale.

Five dedup families, each shaped for 100 TB:

- exact:       hash-groupBy on md5(text) — one shuffle, partial-agg.
- minhash+LSH: shingle -> k minhashes -> b bands -> bucket join.
               Candidate generation never compares all pairs; the
               band-bucket self-join only explodes within buckets.
- simhash:     64-bit sign-sum fingerprint via a vectorized numpy
               pandas UDF (Arrow batches; no per-row Python).
- n-gram Jaccard: exact verification on candidate pairs only.
- embedding near-dup: cosine > threshold via LSH bucketing (see
               similarity.py) or brute verification on candidates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .text import tokens

# ------------------------------------------------------------------ exact


def exact_dup_groups(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(text_md5, n_dups, min_doc_id): groups with >1 identical text.
    Keep-first policy: min id is the canonical survivor."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_dups") > 1)
    )


def dedup_exact(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id doc per distinct text (deterministic)."""
    w = (
        docs.groupBy(F.md5(F.col(text_col)).alias("_h"))
        .agg(F.min(id_col).alias(id_col))
    )
    return docs.join(w, id_col, "leftsemi")


# ------------------------------------------------------------- shingling


def word_shingles(col: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles (array<string>)."""
    toks = tokens(col)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    sh = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " "))
    return F.array_distinct(F.when(n >= k, sh).otherwise(toks))


# ------------------------------------------------------------- minhash


def minhash_signature(col: Column, num_hashes: int = 32, k: int = 3) -> Column:
    """array<long> of minhashes: sig[i] = min over shingles of
    xxhash64(i, shingle). All JVM-side (xxhash64 in transform)."""
    sh = word_shingles(col, k)
    sigs = [
        F.array_min(F.transform(sh, lambda s, i=i: F.xxhash64(F.lit(i), s)))
        for i in range(num_hashes)
    ]
    return F.array(*sigs)


def minhash_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
) -> DataFrame:
    """(id_a, id_b) candidate near-dup pairs: docs sharing >=1 LSH
    band bucket. rows_per_band = num_hashes/bands.

    Scale shape: explode to (band, band_hash, id); the self-join is on
    (band, band_hash) — bucket-local. Skewed buckets (boilerplate) are
    the classic hazard; AQE skew-join splitting is on, and callers can
    cap bucket size with `max_bucket` semantics downstream.
    """
    r = num_hashes // bands
    sig = docs.select(
        F.col(id_col).alias("id"),
        minhash_signature(F.col(text_col), num_hashes, k).alias("sig"),
    )
    bands_df = sig.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(F.concat_ws(
                        ",", *[F.element_at("sig", b * r + j + 1) for j in range(r)]
                    )).alias("bucket"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    a = bands_df.alias("a")
    b = bands_df.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs (verification stage):
    (id_a, id_b, jaccard). JVM array ops on pre-computed shingles."""
    sh = docs.select(
        F.col(id_col).alias("id"), word_shingles(F.col(text_col), k).alias("sh")
    )
    a = sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a")
    b = sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        pairs.join(a, "id_a").join(b, "id_b")
        .select(
            "id_a", "id_b",
            F.round(F.when(union > 0, inter / union).otherwise(0.0), 5)
            .alias("jaccard"),
        )
    )


def minhash_dedup(
    docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates -> exact Jaccard filter
    -> connected components over the dup graph -> keep min id per
    cluster. Returns the surviving docs."""
    from ..algorithms import connected_components
    from ..graph import Graph

    cands = minhash_lsh_candidates(docs, text_col, id_col, num_hashes, bands, k)
    dups = jaccard_pairs(docs, cands, text_col, id_col, k).filter(
        F.col("jaccard") >= threshold
    )
    if dups.isEmpty():
        return docs
    g = Graph.from_edges(dups.select(F.col("id_a").alias("src"),
                                     F.col("id_b").alias("dst")))
    comp = connected_components(g).state.select(
        F.col("id").alias(id_col), "component"
    )
    keep = comp.groupBy("component").agg(F.min(id_col).alias(id_col))
    drop = comp.join(keep, [id_col], "left_anti").select(id_col)
    return docs.join(drop, id_col, "left_anti")


# -------------------------------------------------------------- simhash


def _simhash64_kernel(texts: pd.Series) -> pd.Series:
    """Vectorized 64-bit SimHash over whitespace tokens (Arrow batch;
    numpy bit ops, no per-row Python hashing — tokens are hashed with
    a splitmix64 finalizer over numpy uint64 of their Python hash is
    NOT deterministic across processes, so we use md5 via hashlib on
    unique tokens per batch, cached)."""
    import hashlib

    out = np.zeros(len(texts), dtype=np.int64)
    cache: dict[str, int] = {}

    def h64(tok: str) -> int:
        v = cache.get(tok)
        if v is None:
            v = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            cache[tok] = v
        return v

    for i, t in enumerate(texts):
        if not t:
            continue
        toks = t.split()
        if not toks:
            continue
        hs = np.fromiter((h64(tok) for tok in toks), dtype=np.uint64,
                         count=len(toks))
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
        votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        sim = np.uint64(0)
        for b in range(64):
            if votes[b] > 0:
                sim |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(sim)
    return pd.Series(out)


def simhash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    # pandas_udf is constructed lazily (needs an active session in Spark 4)
    udf = pandas_udf(_simhash64_kernel, "long")
    return docs.withColumn("simhash", udf(F.col(text_col)))


def simhash_near_dups(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming.
    Bucketing: 4 x 16-bit blocks — any pair within hamming<=3 shares
    at least one exact block (pigeonhole), so the join is block-local."""
    sh = simhash(docs, text_col).select(F.col(id_col).alias("id"), "simhash")
    blocks = sh.select(
        "id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("blk"),
                F.shiftrightunsigned("simhash", 16 * b).bitwiseAND(F.lit(0xFFFF))
                .alias("key"),
            )
            for b in range(4)
        ])).alias("bb"),
    ).select("id", "simhash", "bb.blk", "bb.key")
    a, b = blocks.alias("a"), blocks.alias("b")
    pairs = (
        a.join(b, (F.col("a.blk") == F.col("b.blk"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.simhash").alias("h_a"), F.col("b.simhash").alias("h_b"))
        .distinct()
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return pairs.select("id_a", "id_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
