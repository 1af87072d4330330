"""Corpus-cleaning operators: cross-doc line dedup, C4 line filters,
deterministic hash splits and quality sampling (datapipe/clean.py).

Oracles are hand-rolled Python replicas over tiny fixtures; the
SQL-differential coverage runs in test_entry_oracle.py (queries
line_dedup / c4_clean / split_counts / qsample).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from powergraph_spark.datapipe import (
    c4_line_filter,
    hash_split,
    line_dedup,
    quality_sample,
)

DOCS = [
    (1, "alpha beta gamma delta eps.\ncommon line here\nunique one"),
    (2, "common line here\nanother thing entirely\n\n  common line here  "),
    (3, "common line here"),
    (4, ""),
]


def _py_line_dedup(docs):
    """Driver-side replica: global first occurrence by (id, pos)."""
    lines = []
    for i, t in docs:
        ls = [x.strip() for x in t.split("\n")]
        ls = [x for x in ls if x]
        for p, l in enumerate(ls):
            lines.append((i, p, l))
    first = {}
    count = {}
    for i, p, l in lines:
        count[l] = count.get(l, 0) + 1
        if l not in first or (i, p) < first[l]:
            first[l] = (i, p)
    out = {}
    for i, t in docs:
        ls = [x.strip() for x in t.split("\n")]
        ls = [x for x in ls if x]
        kept = [
            l
            for p, l in enumerate(ls)
            if count[l] == 1 or first[l] == (i, p)
        ]
        out[i] = (len(ls), len(kept), "\n".join(kept))
    return out


def test_line_dedup_first_occurrence(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["text_clean"])
        for r in line_dedup(docs).collect()
    }
    assert got == _py_line_dedup(DOCS)
    # doc 1 owns the first "common line here"; docs 2/3 lose theirs
    assert "common line here" in got[1][2]
    assert "common line here" not in got[2][2]
    assert got[3] == (1, 0, "")
    assert got[4] == (0, 0, "")


def test_line_dedup_partitioning_invariant(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = sorted(map(tuple, line_dedup(docs.repartition(1)).collect()))
    b = sorted(map(tuple, line_dedup(docs.repartition(7)).collect()))
    assert a == b


C4_DOCS = [
    # 3 good lines, one short, one unterminated, one javascript marker
    (1, "This line has five words.\nshort line.\n"
        "No terminal punctuation right here at all\n"
        "Another good line right here!\n"
        "A third fine sentence stands here.\n"
        "please enable javascript to view this."),
    # doc-level lorem ipsum marker kills it despite 4 good lines
    (2, "lorem ipsum dolor sit amet.\nThis line has five words.\n"
        "Another good line right here!\n"
        "A third fine sentence stands here."),
    # brace marker
    (3, "function f() { return 1; }\nThis line has five words.\n"
        "Another good line right here!\nA third fine sentence stands here."),
    # too few survivors
    (4, "This line has five words.\nAnother good line right here!"),
]


def test_c4_line_filter_rules(spark):
    docs = spark.createDataFrame(C4_DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in c4_line_filter(docs).collect()}
    assert got[1]["n_lines"] == 6 and got[1]["n_kept"] == 3
    assert got[1]["kept"] is True
    assert got[1]["text_clean"].count("\n") == 2
    assert "javascript" not in got[1]["text_clean"]
    assert got[2]["kept"] is False  # lorem ipsum doc marker
    assert got[2]["n_kept"] == 4
    assert got[3]["kept"] is False  # brace doc marker
    assert got[4]["kept"] is False  # < min_lines survivors


def test_c4_line_filter_zero_shuffle(spark):
    docs = spark.createDataFrame(C4_DOCS, "doc_id long, text string")
    plan = (
        c4_line_filter(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # pure projection: no shuffle at any SF


def test_hash_split_deterministic_and_stable(spark):
    ids = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    s1 = {r["doc_id"]: r["split"] for r in hash_split(ids).collect()}
    s2 = {
        r["doc_id"]: r["split"]
        for r in hash_split(ids.repartition(13)).collect()
    }
    assert s1 == s2  # partitioning-invariant
    # appending rows never reshuffles old assignments
    more = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    s3 = {r["doc_id"]: r["split"] for r in hash_split(more).collect()}
    assert all(s3[k] == v for k, v in s1.items())
    # fractions are roughly honored (md5-uniform; 2000 draws)
    from collections import Counter

    c = Counter(s1.values())
    assert set(c) <= {"train", "val", "test"}
    assert abs(c["train"] / 2000 - 0.9) < 0.05
    assert c["val"] > 0 and c["test"] > 0


def test_quality_sample_threshold_semantics(spark):
    docs = spark.createDataFrame(
        [(i, "x" * (i % 7)) for i in range(200)], "doc_id long, text string"
    )
    # weight 0 -> nothing; weight 1 -> everything
    assert quality_sample(docs, F.lit(0.0)).count() == 0
    assert quality_sample(docs, F.lit(1.0)).count() == 200
    # clamping: out-of-range weights behave like 0/1
    assert quality_sample(docs, F.lit(-3.0)).count() == 0
    assert quality_sample(docs, F.lit(7.0)).count() == 200
    # every kept row satisfies u < w and the draw is reproducible
    kept = quality_sample(docs, F.lit(0.5)).collect()
    assert 0 < len(kept) < 200
    assert all(r["u"] < r["w"] for r in kept)
    again = quality_sample(docs, F.lit(0.5)).collect()
    assert sorted(r["doc_id"] for r in kept) == sorted(
        r["doc_id"] for r in again
    )


def test_pack_sequences_replica(spark):
    from powergraph_spark.datapipe import pack_sequences

    docs = [(i, "w " * ((i * 13) % 37 + 1)) for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["shard"], r["bin"], r["n_tokens"])
        for r in pack_sequences(df, budget=50, n_shards=4).collect()
    }
    # python replica: shard-local prefix sums in id order
    cum = {}
    for i, t in docs:
        n = len(t.split())
        s = i % 4
        prev = cum.get(s, 0)
        assert got[i] == (s, prev // 50, n), (i, got[i], (s, prev // 50, n))
        cum[s] = prev + n
    # every doc present exactly once
    assert len(got) == 60


def test_pack_sequences_partitioning_invariant(spark):
    from powergraph_spark.datapipe import pack_sequences

    df = spark.createDataFrame(
        [(i, "tok " * (i % 9 + 1)) for i in range(80)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, pack_sequences(df.repartition(1), 30, 4).collect()))
    b = sorted(map(tuple, pack_sequences(df.repartition(11), 30, 4).collect()))
    assert a == b


def test_corpus_ngram_counts_replica(spark):
    from collections import Counter

    from powergraph_spark.datapipe import corpus_ngram_counts

    docs = [
        (1, "the cat sat on the mat"),
        (2, "THE CAT ran"),
        (3, "one"),
        (4, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["gram"]: (r["count"], r["n_docs"])
        for r in corpus_ngram_counts(df, n=2).collect()
    }
    total, per_doc = Counter(), {}
    for i, t in docs:
        toks = [x.lower() for x in t.split()]
        grams = [" ".join(toks[j:j + 2]) for j in range(len(toks) - 1)]
        total.update(grams)
        for g in set(grams):
            per_doc[g] = per_doc.get(g, 0) + 1
    assert got == {g: (c, per_doc[g]) for g, c in total.items()}
    assert got["the cat"] == (2, 2)  # lowercased across docs


def test_quantize_roundtrip_and_edges(spark):
    from powergraph_spark.datapipe import (
        dequantize_embeddings,
        quantize_embeddings,
    )

    rows = [
        (1, [1.0, -0.5, 0.25, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),       # all-zero -> scale 0, codes 0
        (3, [-2.0, 2.0, 1.0, -1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert q[1]["scale"] == 1.0 and q[1]["q"] == [127, -64, 32, 0]
    assert q[2]["scale"] == 0.0 and q[2]["q"] == [0, 0, 0, 0]
    assert q[3]["q"] == [-127, 127, 64, -64]
    # roundtrip error bounded by scale / (2 * 127) per component
    deq = {
        r["vec_id"]: r["dequantized"]
        for r in dequantize_embeddings(quantize_embeddings(df)).collect()
    }
    for vid, emb in rows:
        s = max(abs(x) for x in emb)
        for a, b in zip(deq[vid], emb):
            assert abs(a - b) <= s / 254 + 1e-12


def test_bigram_lm_scores_replica(spark):
    import math
    from collections import Counter

    from powergraph_spark.datapipe import bigram_lm_scores

    lm = [(1, "the cat sat on the mat"), (2, "the cat ran away")]
    score = [(10, "the cat sat"), (11, "purple zebra the cat"),
             (12, "one"), (13, "")]
    lmdf = spark.createDataFrame(lm, "doc_id long, text string")
    sdf = spark.createDataFrame(score, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in bigram_lm_scores(sdf, lm_docs=lmdf).collect()
    }

    uni, bi = Counter(), Counter()
    for _, t in lm:
        toks = t.lower().split()
        uni.update(toks)
        bi.update(" ".join(toks[i:i + 2]) for i in range(len(toks) - 1))
    N, V = sum(uni.values()), len(uni)
    for i, t in score:
        toks = t.lower().split()
        grams = [" ".join(toks[k:k + 2]) for k in range(len(toks) - 1)]
        if not grams:
            assert got[i] == (0, 0.0)
            continue
        lps = []
        for g in grams:
            w1, w2 = g.split(" ")
            if bi[g] > 0:
                lps.append(math.log(bi[g] / uni[w1]))
            else:
                lps.append(math.log(0.4 * (uni[w2] + 1) / (N + V)))
        want = round(sum(lps) / len(lps), 5)
        assert got[i] == (len(grams), want), (i, got[i], want)
    # seen text scores higher than OOV-heavy text
    assert got[10][1] > got[11][1]


def test_tfidf_top_terms_replica(spark):
    import math
    from collections import Counter

    from powergraph_spark.datapipe import tfidf_top_terms

    docs = [
        (1, "apple apple banana cherry"),
        (2, "banana banana banana date"),
        (3, "apple cherry cherry cherry date"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["term"], r["rank"], r["score"])
        for r in tfidf_top_terms(df, k=2).collect()
    )

    D = len(docs)
    dfreq = Counter()
    tfs = {}
    for i, t in docs:
        c = Counter(t.lower().split())
        tfs[i] = c
        dfreq.update(c.keys())
    want = []
    for i, _ in docs:
        scored = sorted(
            (
                (-tf * (math.log((D + 1) / (dfc + 1)) + 1), term)
                for term, tf in tfs[i].items()
                for dfc in [dfreq[term]]
            ),
        )
        for rank, (neg, term) in enumerate(scored[:2], start=1):
            want.append((i, term, rank, round(-neg, 5)))
    assert got == sorted(want)
    # rare terms outrank ubiquitous ones at equal tf
    top1 = {r[0]: r[1] for r in got if r[2] == 1}
    assert top1[1] == "apple" and top1[2] == "banana"
