"""Text analysis for large-scale training-data pipelines.

All hot-path functions are pure JVM column expressions (whole-stage
codegen; no Python). These extend the reference's capability surface
per the graft mandate (the reference has no text ops — its payload is
the link graph; these operate on the same web-page corpus).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small deterministic marker-word lists for the n-gram/stopword
# language heuristic (public common-stopword knowledge).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "est", "que", "pour", "dans"],
    "es": ["el", "la", "los", "que", "de", "es", "por", "con"],
    "it": ["il", "la", "che", "di", "non", "per", "con", "una"],
    "pt": ["o", "a", "que", "de", "não", "para", "com", "uma"],
}

_TOKEN_SPLIT = r"[ \t\n\r\f]+"
# BPE-ish word/punct segmentation: letter runs, digit runs, single
# punctuation marks (approximation of byte-level BPE pre-tokenizers).
_BPE_TOKEN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column) -> Column:
    """Whitespace tokens; empty string -> empty array."""
    t = F.split(F.trim(col), _TOKEN_SPLIT)
    return F.when(F.trim(col) == "", F.array().cast("array<string>")).otherwise(t)


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col)).cast("long")


def bpe_token_count(col: Column) -> Column:
    """Approximate subword-count: letter runs + digit runs + punct
    marks (regexp-based, JVM-side)."""
    return F.size(F.regexp_extract_all(col, F.lit(_BPE_TOKEN), 0)).cast("long")


def char_count(col: Column) -> Column:
    return F.length(col).cast("long")


def stopword_ratio(col: Column, lang_markers: list[str] | None = None) -> Column:
    """Fraction of tokens that are (english-default) stopwords."""
    markers = lang_markers or LANG_MARKERS["en"]
    toks = F.transform(tokens(col), lambda t: F.lower(t))
    hits = F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers])))
    n = F.size(toks)
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def punct_ratio(col: Column) -> Column:
    """Punctuation chars / total chars."""
    n = F.length(col)
    p = F.length(F.regexp_replace(col, r"[^!-/:-@\[-`{-~]", ""))
    return F.when(n > 0, p.cast("double") / n).otherwise(F.lit(0.0))


def alpha_ratio(col: Column) -> Column:
    n = F.length(col)
    a = F.length(F.regexp_replace(col, r"[^A-Za-z]", ""))
    return F.when(n > 0, a.cast("double") / n).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + alpha ratio -
    punctuation excess. Deterministic, expression-only."""
    n = F.length(col).cast("double")
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    score = (
        F.lit(0.4) * len_score
        + F.lit(0.4) * alpha_ratio(col)
        + F.lit(0.2) * (F.lit(1.0) - F.least(punct_ratio(col) * 4, F.lit(1.0)))
    )
    return F.round(score, 5)


def lang_id(col: Column) -> Column:
    """Heuristic language id: argmax of marker-word hit counts over the
    token multiset; tie/no-hit -> 'und'. Pure expressions — builds a
    (lang, hits) struct array and max_by's it."""
    toks = F.transform(tokens(col), lambda t: F.lower(t))
    scored = []
    for lang in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
        scored.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    arr = F.array(*scored)
    best = F.array_max(F.filter(arr, lambda s: s["hits"] > 0))
    # array_max on struct: max hits, tie -> lexicographically LARGEST
    # lang; invert via reverse-sorted build order is fragile, so break
    # ties by preferring the earliest lang with max hits:
    maxhits = F.array_max(F.transform(arr, lambda s: s["hits"]))
    first_best = F.element_at(
        F.filter(arr, lambda s: s["hits"] == maxhits), 1
    )["lang"]
    return F.when(maxhits > 0, first_best).otherwise(F.lit("und"))


def doc_fingerprint(col: Column, shingle_k: int = 5) -> Column:
    """Document fingerprint: minimum md5 over word 5-gram shingles
    (winnowing-style rolling selection, deterministic, portable to
    ANSI SQL for the oracle). Short docs fall back to md5(text)."""
    toks = tokens(col)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (shingle_k - 1), F.lit(1)))
    shingles = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i, shingle_k), " ")
    )
    return F.when(
        n >= shingle_k, F.array_min(F.transform(shingles, F.md5))
    ).otherwise(F.md5(col))


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass per-document stat row (all expression-level)."""
    c = F.col(text_col)
    return docs.select(
        "*",
        token_count(c).alias("n_tokens"),
        bpe_token_count(c).alias("n_bpe_tokens"),
        char_count(c).alias("n_chars_computed"),
        F.round(stopword_ratio(c), 5).alias("stopword_ratio"),
        F.round(punct_ratio(c), 5).alias("punct_ratio"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_pred"),
        doc_fingerprint(c).alias("fingerprint"),
    )


# ------------------------------------------------- repetition signals
# Gopher-style repetition quality rules (Rae et al. 2021, public):
# documents dominated by repeated lines / paragraphs / n-grams are
# low-quality boilerplate. All pure JVM expressions (no Python in the
# hot path); exact definitions below are this engine's (documented)
# instantiation of the published ideas, mirrored 1:1 by the SQL oracle.


def _nonempty_segments(col: Column, sep_regex: str) -> Column:
    segs = F.transform(F.split(col, sep_regex), lambda x: F.trim(x))
    return F.filter(segs, lambda x: x != "")


def dup_line_fraction(col: Column) -> Column:
    """Fraction of non-empty trimmed lines that are repeats of an
    earlier line: 1 - |distinct| / |lines| (0 for line-less text)."""
    ls = _nonempty_segments(col, "\n")
    n = F.size(ls)
    d = F.size(F.array_distinct(ls))
    return F.when(n > 0, (n - d).cast("double") / n).otherwise(F.lit(0.0))


def dup_paragraph_fraction(col: Column) -> Column:
    """Same rule over blank-line-separated paragraphs."""
    ps = _nonempty_segments(col, "\n{2,}")
    n = F.size(ps)
    d = F.size(F.array_distinct(ps))
    return F.when(n > 0, (n - d).cast("double") / n).otherwise(F.lit(0.0))


def dup_line_char_fraction(col: Column) -> Column:
    """Fraction of line characters occupied by repeat occurrences:
    (total line chars - distinct line chars) / total line chars."""
    ls = _nonempty_segments(col, "\n")
    zero = F.lit(0).cast("long")
    total = F.aggregate(ls, zero, lambda a, x: a + F.length(x))
    dist = F.aggregate(F.array_distinct(ls), zero, lambda a, x: a + F.length(x))
    return F.when(
        total > 0, (total - dist).cast("double") / total
    ).otherwise(F.lit(0.0))


def _word_ngrams(col: Column, n: int) -> Column:
    """Lowercased word n-grams (space-joined); [] when < n tokens."""
    toks = F.transform(tokens(col), lambda t: F.lower(t))
    cnt = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), cnt - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(cnt >= n, grams).otherwise(F.array().cast("array<string>"))


def top_ngram_char_fraction(col: Column, n: int = 2) -> Column:
    """Characters covered by the single most frequent word n-gram
    (count * gram length / text chars, clamped to 1; overlapping
    occurrences all count). Ties break to the lexicographically
    smallest gram — deterministic and SQL-replayable."""
    sg = F.array_sort(_word_ngrams(col, n))
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit("").alias("bg"),
        F.lit(0).cast("long").alias("bc"),
    )

    def merge(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.when(run > acc["bc"], x).otherwise(acc["bg"]).alias("bg"),
            F.greatest(run, acc["bc"]).alias("bc"),
        )

    best = F.aggregate(sg, zero, merge)
    chars = F.length(col)
    cover = best["bc"] * F.length(best["bg"])
    return F.when(
        (chars > 0) & (best["bc"] > 0),
        F.least(cover.cast("double") / chars, F.lit(1.0)),
    ).otherwise(F.lit(0.0))


def repeated_ngram_char_fraction(col: Column, n: int = 5) -> Column:
    """Characters in repeat occurrences of any word n-gram (total gram
    chars - distinct gram chars) / text chars, clamped to 1."""
    grams = _word_ngrams(col, n)
    zero = F.lit(0).cast("long")
    total = F.aggregate(grams, zero, lambda a, x: a + F.length(x))
    dist = F.aggregate(
        F.array_distinct(grams), zero, lambda a, x: a + F.length(x)
    )
    chars = F.length(col)
    return F.when(
        (chars > 0) & (total > dist),
        F.least((total - dist).cast("double") / chars, F.lit(1.0)),
    ).otherwise(F.lit(0.0))


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document repetition signal row (one JVM-only pass)."""
    c = F.col(text_col)
    return docs.select(
        "*",
        F.round(dup_line_fraction(c), 5).alias("dup_line_frac"),
        F.round(dup_paragraph_fraction(c), 5).alias("dup_para_frac"),
        F.round(dup_line_char_fraction(c), 5).alias("dup_line_char_frac"),
        F.round(top_ngram_char_fraction(c, 2), 5).alias("top_2gram_frac"),
        F.round(top_ngram_char_fraction(c, 3), 5).alias("top_3gram_frac"),
        F.round(repeated_ngram_char_fraction(c, 5), 5).alias("rep_5gram_frac"),
    )


def repetition_filter(
    col: Column,
    max_dup_line_frac: float = 0.30,
    max_dup_para_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_top_2gram_frac: float = 0.20,
    max_rep_5gram_frac: float = 0.15,
) -> Column:
    """Boolean keep-predicate combining the repetition rules at the
    published Gopher-style default thresholds."""
    return (
        (dup_line_fraction(col) <= max_dup_line_frac)
        & (dup_paragraph_fraction(col) <= max_dup_para_frac)
        & (dup_line_char_fraction(col) <= max_dup_line_char_frac)
        & (top_ngram_char_fraction(col, 2) <= max_top_2gram_frac)
        & (repeated_ngram_char_fraction(col, 5) <= max_rep_5gram_frac)
    )


# ------------------------------------------------------------ PII redaction

# Portable regexes (no lookaround; valid in both Java regex and RE2,
# so the DuckDB oracle applies the identical patterns):
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    "phone": (r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{3,4}",
              "<PHONE>"),
    "ssn": (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
}


def redact_pii(col: Column, kinds: list[str] | None = None) -> Column:
    """Replace email / IPv4 / phone / SSN-shaped spans with typed
    placeholders — the standard pre-training scrub pass. Pure JVM
    regexp_replace chain (one codegen'd projection; no Python, no
    shuffle — embarrassingly parallel over 100 TB). Patterns avoid
    lookaround so an ANSI/RE2 oracle applies them verbatim."""
    out = col
    for kind in kinds or list(PII_PATTERNS):
        pat, repl = PII_PATTERNS[kind]
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(col: Column) -> list[Column]:
    """One count column per PII kind (diagnostic / audit stream)."""
    return [
        F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0)))
        .cast("long").alias(f"n_{kind}")
        for kind, (pat, _r) in PII_PATTERNS.items()
    ]


# ---------------------------------------------- corpus vocabulary stats
def corpus_ngram_counts(
    docs: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> DataFrame:
    """Corpus-wide lowercased word n-gram counts — the vocabulary /
    merge-statistics pass a tokenizer-training pipeline runs first.

    Classic wordcount shape: explode → hash aggregate (map-side
    partial combine is automatic), so the shuffle carries one
    (gram, partial_count) row per distinct gram per partition, never
    the corpus. Returns (gram, n_docs, count) where count sums every
    occurrence and n_docs counts distinct documents containing it.
    """
    grams = docs.select(
        F.col(id_col),
        F.explode(_word_ngrams(F.col(text_col), n)).alias("gram"),
    )
    out = grams.groupBy("gram").agg(
        F.count(F.lit(1)).alias("count"),
        F.countDistinct(id_col).alias("n_docs"),
    )
    if min_count > 1:
        out = out.filter(F.col("count") >= min_count)
    return out


def bigram_lm_scores(
    docs: DataFrame,
    lm_docs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
) -> DataFrame:
    """Score documents under a bigram language model with stupid
    backoff (Brants et al. 2007, public) — the CCNet/KenLM-style
    perplexity-quality signal, self-trained when ``lm_docs`` is None.

    seen bigram:   lp = ln(c(w1 w2) / c(w1))
    unseen:        lp = ln(alpha * (c(w2) + 1) / (N + V))   (Laplace
    backoff so out-of-vocabulary w2 stays finite).

    Scale shape: the LM is two count tables (wordcount shuffles with
    map-side combine); scoring is three shuffle joins on gram/word
    keys — no driver-side model except the two scalars N (token count)
    and V (vocab size) folded in as literals. Returns (id_col,
    n_bigrams, avg_logprob) with avg_logprob rounded 5dp (0.0 for
    docs with < 2 tokens).
    """
    lm = lm_docs if lm_docs is not None else docs
    ltoks = F.transform(tokens(F.col(text_col)), lambda t: F.lower(t))
    uni = (
        lm.select(F.explode(ltoks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    bi = (
        lm.select(F.explode(_word_ngrams(F.col(text_col), 2)).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    row = uni.agg(
        F.sum("c1").alias("n"), F.count(F.lit(1)).alias("v")
    ).first()
    N, V = int(row["n"] or 0), int(row["v"] or 0)

    db = docs.select(
        F.col(id_col),
        F.explode(_word_ngrams(F.col(text_col), 2)).alias("g"),
    ).select(
        id_col,
        "g",
        F.split(F.col("g"), " ")[0].alias("w1"),
        F.split(F.col("g"), " ")[1].alias("w2"),
    )
    j = (
        db.join(bi.hint("shuffle_hash"), "g", "left")
        .join(
            uni.selectExpr("w AS w1", "c1").hint("shuffle_hash"),
            "w1",
            "left",
        )
        .join(
            uni.selectExpr("w AS w2", "c1 AS c2").hint("shuffle_hash"),
            "w2",
            "left",
        )
    )
    lp = F.when(
        F.col("c12").isNotNull(),
        F.log(F.col("c12").cast("double") / F.col("c1")),
    ).otherwise(
        F.log(
            F.lit(alpha)
            * (F.coalesce(F.col("c2"), F.lit(0)) + 1).cast("double")
            / F.lit(float(N + V))
        )
    )
    scored = j.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg(lp), 5).alias("avg_logprob"),
    )
    base = docs.select(id_col)
    return base.join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce("avg_logprob", F.lit(0.0)).alias("avg_logprob"),
    )


def ppl_cutoffs(
    docs: DataFrame,
    fractions: tuple[float, ...] = (1.0 / 3.0, 2.0 / 3.0),
    lm_docs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[float, ...]:
    """Fit CCNet-style bucket cutoffs: exact distributed percentiles
    of the bigram-LM avg_logprob (one aggregate job — no global sort,
    no collect of scores). Production shape: fit once on a sample,
    then bucket the full corpus with the constants."""
    s = bigram_lm_scores(docs, lm_docs, text_col=text_col, id_col=id_col)
    row = s.agg(
        F.percentile("avg_logprob", F.lit(list(fractions))).alias("p")
    ).first()
    return tuple(float(x) for x in row["p"])


def ppl_buckets(
    docs: DataFrame,
    cutoffs: tuple[float, float],
    lm_docs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style head/middle/tail quality bucketing (Wenzek et al.,
    LREC 2020 shape) on the bigram stupid-backoff LM signal:
    ``head`` = avg_logprob >= cutoffs[1] (lowest perplexity),
    ``middle`` >= cutoffs[0], else ``tail``. Cutoffs are FIXED
    constants (fit offline via ppl_cutoffs), so bucketing is a pure
    projection over bigram_lm_scores — corpus-size-linear, no global
    ordering anywhere. avg_logprob is rounded 5dp upstream, making
    the threshold comparison engine-stable."""
    c1, c2 = cutoffs
    s = bigram_lm_scores(docs, lm_docs, text_col=text_col, id_col=id_col)
    bucket = (
        F.when(F.col("avg_logprob") >= F.lit(c2), F.lit("head"))
        .when(F.col("avg_logprob") >= F.lit(c1), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return s.select(id_col, "avg_logprob", bucket.alias("bucket"))


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k tf-idf terms per document (smoothed idf, the sklearn
    formulation: idf = ln((D + 1) / (df + 1)) + 1, public) — keyword
    extraction / topic tagging for corpus curation.

    Two wordcount-shaped aggregations (term-frequency per doc, doc-
    frequency per term), one shuffle-hash join on the term key, and a
    per-doc top-k window (WindowGroupLimit keeps it partial). D is the
    only driver scalar. Deterministic ties: score desc, term asc.
    Returns (id_col, term, rank, score 5dp).
    """
    ltoks = F.transform(tokens(F.col(text_col)), lambda t: F.lower(t))
    pairs = docs.select(F.col(id_col), F.explode(ltoks).alias("term"))
    tf = pairs.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    D = docs.count()
    scored = tf.join(dfreq.hint("shuffle_hash"), "term").withColumn(
        "score",
        F.col("tf")
        * (
            F.log(
                F.lit(float(D + 1))
                / (F.col("df") + 1).cast("double")
            )
            + F.lit(1.0)
        ),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            id_col, "term", "rank", F.round("score", 5).alias("score")
        )
    )
