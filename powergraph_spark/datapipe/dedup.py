"""Deduplication at training-data scale.

Five dedup families, each shaped for 100 TB:

- exact:       hash-groupBy on md5(text) — one shuffle, partial-agg.
- minhash+LSH: shingle -> k minhashes -> b bands -> bucket join.
               Candidate generation never compares all pairs; the
               band-bucket self-join only explodes within buckets.
- simhash:     64-bit sign-sum fingerprint, pure JVM expressions
               (md5 + bit votes in one partial-agg'd shuffle).
- n-gram Jaccard: exact verification on candidate pairs only.
- embedding near-dup: cosine > threshold via LSH bucketing (see
               similarity.py) or brute verification on candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import token_count, tokens

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


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    k: int = 3,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(id, sig array) minhash signatures, all JVM-side.

    hash_family='xxhash64' (scale default): array<long>,
        sig[i] = min over shingles of xxhash64(i, shingle).
    hash_family='md5' (portable/oracle-checkable): array<string>,
        sig[i] = lexicographic MIN over shingles of md5('i:' || shingle)
        — byte-identical to ANSI SQL `MIN(md5(i || ':' || s))`, so a
        DuckDB oracle can recompute the signature exactly.

    Shape: explode shingles once, then num_hashes plain MIN aggregates
    in ONE partially-aggregated groupBy — map-side combine keeps the
    shuffle at |docs| x num_hashes regardless of shingle count. (This
    replaces an earlier array_min-of-transform formulation: computing
    N sibling min-hashes inside nested higher-order functions tripped
    a Spark analyzer/codegen lambda-binding corruption — array_min
    values matching no md5 of any input. The explode+agg shape is both
    correct and the better plan.)

    Docs with zero shingles (empty text) produce no row, matching the
    SQL `unnest` semantics of the oracle.
    """
    ex = docs.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), k)).alias("s"),
    )
    if hash_family == "md5":
        aggs = [
            F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("s")))).alias(f"m{i}")
            for i in range(num_hashes)
        ]
    else:
        aggs = [
            F.min(F.xxhash64(F.lit(i), F.col("s"))).alias(f"m{i}")
            for i in range(num_hashes)
        ]
    agg = ex.groupBy("id").agg(*aggs)
    return agg.select(
        "id", F.array(*[F.col(f"m{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    hash_family: str = "xxhash64",
    max_bucket: int | None = 1000,
) -> DataFrame:
    """(id_a, id_b) candidate near-dup pairs: docs sharing >=1 LSH
    band bucket. rows_per_band = num_hashes/bands.

    Scale shape: explode to (band, band_hash, id); the self-join is on
    (band, band_hash) — bucket-local, never all-pairs. `max_bucket`
    caps the classic boilerplate hazard: a bucket with B members emits
    B^2 pairs, so buckets larger than max_bucket are DROPPED before the
    self-join (standard practice — oversized buckets are near-useless
    for dedup; a 10^6-member boilerplate bucket would emit 10^12 pairs
    no matter how AQE splits the skew). Dropped-bucket stats are
    observable via `minhash_bucket_histogram`.
    """
    bands_df = _minhash_bands(
        docs, text_col, id_col, num_hashes, bands, k, hash_family
    )
    if max_bucket is not None:
        # bucket-size cap as a COUNT window over (band, bucket): rides
        # the same single shuffle the self-join needs anyway (both hash
        # by the bucket key), so the cap adds zero exchanges and never
        # recomputes the signature pipeline. (An earlier groupBy-sizes
        # + leftsemi formulation scanned the un-cached band pipeline a
        # second time — measured ~+35% on the sf0.1 bench.)
        from pyspark.sql import Window

        w = Window.partitionBy("band", "bucket")
        bands_df = (
            bands_df.withColumn("_n", F.count(F.lit(1)).over(w))
            .filter(F.col("_n") <= max_bucket)
            .drop("_n")
        )
    a = bands_df.alias("a")
    b = bands_df.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def _minhash_bands(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    bands: int,
    k: int,
    hash_family: str,
) -> DataFrame:
    """(id, band, bucket): band bucket per doc per band. Bucket =
    hash of the band's r consecutive signature values joined by ','."""
    r = num_hashes // bands
    sig = minhash_signatures(docs, text_col, id_col, num_hashes, k, hash_family)
    band_key = [
        F.concat_ws(",", *[
            F.element_at("sig", b * r + j + 1).cast("string") for j in range(r)
        ])
        for b in range(bands)
    ]
    bucket_of = [
        F.md5(band_key[b]) if hash_family == "md5" else F.xxhash64(band_key[b])
        for b in range(bands)
    ]
    return sig.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), bucket_of[b].alias("bucket"))
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")


def minhash_bucket_histogram(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(bucket_size, n_buckets): the skew diagnostic behind max_bucket."""
    bands_df = _minhash_bands(
        docs, text_col, id_col, num_hashes, bands, k, hash_family
    )
    return (
        bands_df.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .groupBy("bucket_size")
        .agg(F.count(F.lit(1)).alias("n_buckets"))
        .orderBy("bucket_size")
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

_HEX = "0123456789abcdef"


def simhash(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash as a 16-char lowercase hex string — zero Python
    in the path (the round-1 per-row md5 kernel is gone).

    Spec (deterministic + ANSI-SQL-portable so a DuckDB oracle can
    recompute it bit-for-bit):
      - token set = DISTINCT whitespace tokens of `text`
      - per token: h = md5(token), bit k (k=0..63, MSB-first) is bit
        (3 - k%4) of hex digit k//4
      - vote[k] = sum over tokens of (2*bit - 1)
      - fingerprint bit k = 1 iff vote[k] > 0; emitted as 16 hex chars
      - docs with no tokens -> '0000000000000000'

    Plan shape at 100 TB: explode distinct tokens -> md5 (JVM) ->
    ONE partially-aggregated shuffle of 64 int sums keyed by doc id ->
    expression-only hex assembly. Everything whole-stage-codegen.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    )
    h = toks.select(id_col, F.md5("tok").alias("h"))
    votes = []
    for k in range(64):
        j, b = divmod(k, 4)
        d = f"(instr('{_HEX}', substring(h, {j + 1}, 1)) - 1)"
        votes.append(
            F.expr(
                f"sum(CASE WHEN (({d} >> {3 - b}) & 1) = 1 THEN 1 ELSE -1 END)"
            ).alias(f"v{k}")
        )
    vote_df = h.groupBy(id_col).agg(*votes)
    nibbles = []
    for j in range(16):
        nib = " + ".join(
            f"(CASE WHEN v{4 * j + b} > 0 THEN {8 >> b} ELSE 0 END)"
            for b in range(4)
        )
        nibbles.append(f"substr('{_HEX}', ({nib}) + 1, 1)")
    fp = vote_df.select(
        id_col, F.expr("concat(" + ", ".join(nibbles) + ")").alias("simhash")
    )
    return docs.join(fp, id_col, "left").withColumn(
        "simhash", F.coalesce("simhash", F.lit("0" * 16))
    )


def simhash_hamming(a: str, b: str) -> Column:
    """Hamming distance between two hex-string fingerprint COLUMN NAMES
    (JVM expression: per-nibble XOR popcount)."""
    if not isinstance(a, str) or not isinstance(b, str):
        raise TypeError("simhash_hamming takes column names")
    terms = [
        f"bit_count((instr('{_HEX}', substring({a}, {j + 1}, 1)) - 1)"
        f" ^ (instr('{_HEX}', substring({b}, {j + 1}, 1)) - 1))"
        for j in range(16)
    ]
    return F.expr(" + ".join(terms))


def simhash_block_bounds(max_hamming: int) -> list[tuple[int, int]]:
    """Nibble ranges [(start, end), ...] partitioning the 16-hex-char
    fingerprint into max_hamming+1 contiguous blocks — the pigeonhole
    guarantee needs one MORE block than the bits allowed to differ
    (max_hamming differing bits can spoil at most max_hamming blocks,
    leaving one exactly-equal block shared by every true pair).
    Nibble granularity bounds max_hamming at 15 (16 blocks)."""
    if not 0 <= max_hamming <= 15:
        raise ValueError(
            f"max_hamming={max_hamming}: nibble-block pigeonhole bucketing "
            "supports 0..15 (needs max_hamming+1 <= 16 blocks)"
        )
    n = max_hamming + 1
    return [(16 * b // n, 16 * (b + 1) // n) for b in range(n)]


def simhash_near_dups(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", max_hamming: int = 3,
                      max_bucket: int | None = 1000) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming —
    FULL recall at any max_hamming <= 15.

    Bucketing: the 64-bit fingerprint splits into max_hamming+1
    contiguous nibble blocks; a pair within the hamming budget shares
    at least one exact block (pigeonhole), so the join is block-local
    and the exact hamming filter runs on block-sharing pairs only.
    (max_hamming=3 gives the classic 4 x 16-bit split.) Buckets larger
    than max_bucket are dropped (same boilerplate-bucket rationale as
    minhash_lsh_candidates), capped via a zero-extra-shuffle COUNT
    window on the bucket key."""
    bounds = simhash_block_bounds(max_hamming)
    sh = simhash(docs, text_col, id_col).select(
        F.col(id_col).alias("id"), "simhash"
    )
    blocks = sh.select(
        "id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("blk"),
                F.substring("simhash", lo + 1, hi - lo).alias("key"),
            )
            for b, (lo, hi) in enumerate(bounds)
        ])).alias("bb"),
    ).select("id", "simhash", "bb.blk", "bb.key")
    if max_bucket is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("blk", "key")
        blocks = (
            blocks.withColumn("_n", F.count(F.lit(1)).over(w))
            .filter(F.col("_n") <= max_bucket)
            .drop("_n")
        )
    a, b = blocks.alias("a"), blocks.alias("b")
    pairs = (
        a.join(b, (F.col("a.blk") == F.col("b.blk"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.simhash").alias("h_a"), F.col("b.simhash").alias("h_b"))
        .distinct()
    )
    return pairs.select(
        "id_a", "id_b", simhash_hamming("h_a", "h_b").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


# -------------------------------------- cross-doc exact span dedup


def positional_gram_hashes(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", k: int = 8) -> DataFrame:
    """(doc_id, pos, gram): one row per word-k-gram OCCURRENCE with its
    0-based start-token position and md5 fingerprint. Unlike
    word_shingles (distinct, membership-only), positions are kept so
    duplicated SPANS can be localized inside each document.

    100 TB shape: output cardinality = corpus token count (inherent to
    substring-level dedup — suffix-array methods touch every position
    too); rows are narrow (long, int, 32-char hash) and flow straight
    into one partial-agg'd shuffle on the gram hash."""
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.md5(F.array_join(F.slice(toks, i, k), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(grams).alias("pos", "gram"),
    )


def span_dup_stats(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", k: int = 8,
                   min_count: int = 2) -> DataFrame:
    """Exact substring-level dedup signal (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): a
    token position is *duplicated* when it is covered by a word-k-gram
    whose fingerprint occurs >= min_count times in the whole corpus
    (cross-doc or repeated within one doc). Per doc, overlapping
    duplicated k-gram intervals [pos, pos+k) are unioned via a
    running-max window, yielding

        (doc_id, n_tokens, dup_tokens, dup_frac)

    with dup_frac = dup_tokens / n_tokens rounded to 6 digits (0.0 for
    empty docs). Docs with no duplicated span are kept with 0s.

    Execution plan (scale notes): occurrence table -> groupBy(gram)
    count (partial agg, shuffle #1) -> leftsemi back onto the
    occurrences (same gram key, no re-shuffle of the filtered side
    under AQE) -> per-doc running-max window + sum (shuffle #2 on
    doc_id, bounded by document length) -> left join onto per-doc token
    counts. No all-pairs comparison anywhere; the only data-dependent
    blowup is the honest one (every token position is fingerprinted
    once)."""
    from pyspark.sql import Window

    occ = positional_gram_hashes(docs, text_col, id_col, k)
    dup = (
        occ.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("gram")
    )
    duppos = occ.join(dup, "gram", "leftsemi")
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    covered = (
        duppos.withColumn("_end", F.col("pos") + F.lit(k))
        .withColumn("_pme", F.max("_end").over(w))
        .withColumn(
            "_new",
            F.greatest(
                F.lit(0),
                F.col("_end")
                - F.greatest(F.col("pos"), F.coalesce("_pme", "pos")),
            ),
        )
    )
    per = covered.groupBy("doc_id").agg(
        F.sum("_new").cast("long").alias("dup_tokens")
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    return (
        base.join(per, "doc_id", "left")
        .fillna(0, ["dup_tokens"])
        .withColumn(
            "dup_frac",
            F.round(
                F.when(
                    F.col("n_tokens") > 0,
                    F.col("dup_tokens").cast("double") / F.col("n_tokens"),
                ).otherwise(F.lit(0.0)),
                6,
            ),
        )
    )


def span_dedup_filter(docs: DataFrame, max_dup_frac: float = 0.5,
                      text_col: str = "text", id_col: str = "doc_id",
                      k: int = 8, min_count: int = 2) -> DataFrame:
    """Keep documents whose duplicated-span token fraction is
    <= max_dup_frac (symmetric policy: every copy of a heavily
    duplicated document is dropped; pair with dedup_exact /
    minhash_dedup for keep-one canonicalization of full-doc dups)."""
    stats = span_dup_stats(docs, text_col, id_col, k, min_count)
    keep = stats.filter(F.col("dup_frac") <= max_dup_frac).select("doc_id")
    return docs.join(
        keep.withColumnRenamed("doc_id", id_col), id_col, "leftsemi"
    )


def span_dedup_rewrite(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", k: int = 8,
                       min_count: int = 2) -> DataFrame:
    """Single-pass duplicated-span REMOVAL (the surgery variant of
    span_dup_stats, Lee et al. 2022 shape): for every word-k-gram
    fingerprint occurring >= min_count times corpus-wide, the
    lexicographically first occurrence by (doc_id, pos) is the OWNER
    and is kept; every other occurrence marks its [pos, pos+k) token
    interval removable. Per doc, removable intervals are unioned and
    the covered tokens excised; the document is rebuilt as the
    surviving tokens joined by single spaces (token-level surgery —
    original inter-token whitespace is normalized). One pass: the
    rewritten corpus may still contain shorter residual duplicates.

    Returns (id_col, text_col) with `text_col` rewritten ('' when
    everything was removed or the doc was empty).

    100 TB shape: fingerprint occurrences (corpus-token-count rows,
    same table span_dup_stats builds) -> one partial-agg'd shuffle on
    gram computing (count, min(doc,pos)) together -> removable
    intervals -> per-doc running-max MERGE to disjoint intervals
    (doc-bounded window) -> explode merged intervals to covered
    positions (<= corpus token count rows, never k-times inflated) ->
    anti-join against positional tokens -> per-doc ordered
    re-assembly. Every stage is bounded by corpus token count; no
    per-doc quadratic exists()-over-intervals scan."""
    from pyspark.sql import Window

    occ = positional_gram_hashes(docs, text_col, id_col, k)
    own = (
        occ.groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.min(F.struct("doc_id", "pos")).alias("_own"),
        )
        .filter(F.col("_c") >= min_count)
        .select("gram", "_own")
    )
    rem = (
        occ.join(own, "gram")
        .filter(
            ~(
                (F.col("doc_id") == F.col("_own.doc_id"))
                & (F.col("pos") == F.col("_own.pos"))
            )
        )
        .select("doc_id", "pos", (F.col("pos") + F.lit(k)).alias("_e"))
    )
    wprev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wrun = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = (
        rem.withColumn("_pme", F.max("_e").over(wprev))
        .withColumn(
            "_ng",
            F.when(
                F.col("_pme").isNull() | (F.col("pos") > F.col("_pme")),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("_g", F.sum("_ng").over(wrun))
        .groupBy("doc_id", "_g")
        .agg(F.min("pos").alias("_s"), F.max("_e").alias("_me"))
    )
    covered = merged.select(
        "doc_id",
        F.explode(F.sequence(F.col("_s"), F.col("_me") - 1)).alias("_i"),
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("_i", "_tok"),
    )
    kept = toks.join(covered, ["doc_id", "_i"], "left_anti")
    reb = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_i", "_tok"))),
                lambda x: x["_tok"],
            ),
            " ",
        ).alias("_txt")
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(reb, "doc_id", "left")
        .select(
            F.col("doc_id").alias(id_col),
            F.coalesce("_txt", F.lit("")).alias(text_col),
        )
    )
