"""Collapsed-Gibbs LDA vs an exact pure-python replica of the
BSP-determinized chain (reference semantics: cgs_lda.cpp:520-549), plus
statistical recovery of planted topics."""

from __future__ import annotations

import hashlib
import math

import pytest

from powergraph_spark.algorithms.lda import (
    LDAResult,
    doc_word_tokens,
    lda,
    log_likelihood,
    top_words,
)

ALPHA, BETA = 0.5, 0.5


def _u(seed, tag, doc, word, occ):
    h = hashlib.md5(f"{seed}:{tag}:{doc}:{word}:{occ}".encode()).hexdigest()
    return int(h[:8], 16) / float(16 ** 8)


def _py_lda(occs, k, alpha, beta, iters, seed, W):
    """Exact replica: same draws, same float-operation order."""
    z = {
        o: int(math.floor(_u(seed, "init", *o) * k)) for o in occs
    }
    wbeta = float(W * beta)
    changes = []
    for it in range(1, iters + 1):
        dt, wt, nt = {}, {}, [0] * k
        for (d, w, _), t in z.items():
            dt.setdefault(d, [0] * k)[t] += 1
            wt.setdefault(w, [0] * k)[t] += 1
            nt[t] += 1
        new_z, ch = {}, 0
        for o in occs:
            d, w, _ = o
            cur = z[o]
            p = []
            for t in range(k):
                s = 1 if cur == t else 0
                p.append(
                    ((dt[d][t] - s) + alpha)
                    * ((wt[w][t] - s) + beta)
                    / ((float(nt[t]) - s) + wbeta)
                )
            u = _u(seed, str(it), *o)
            total = 0.0
            for t in range(k):
                total = total + p[t]
            pick, cum = k - 1, 0.0
            for t in range(k - 1):
                cum = cum + p[t]
                if u * total < cum:
                    pick = t
                    break
            new_z[o] = pick
            ch += int(pick != cur)
        z = new_z
        changes.append(ch)
    return z, changes


@pytest.fixture(scope="module")
def planted(spark):
    """Two disjoint vocabularies; docs draw words from exactly one."""
    va = ["apple", "banana", "cherry", "grape", "melon", "peach"]
    vb = ["engine", "piston", "clutch", "torque", "valve", "gear"]
    rows = []
    for d in range(20):
        vocab = va if d % 2 == 0 else vb
        text = " ".join(
            vocab[(d * 7 + j * 3) % len(vocab)] for j in range(30)
        )
        rows.append((d, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    toks = doc_word_tokens(docs)
    occs = sorted(
        (r["doc"], r["word"], r["occ"]) for r in toks.collect()
    )
    return docs, toks, occs


def test_lda_matches_python_replica(spark, planted):
    docs, toks, occs = planted
    W = len({w for _, w, _ in occs})
    res = lda(toks, k=2, alpha=ALPHA, beta=BETA, iterations=4,
              seed="t", num_partitions=4)
    exp_z, exp_changes = _py_lda(occs, 2, ALPHA, BETA, 4, "t", W)
    got = {
        (r["doc"], r["word"], r["occ"]): r["z"]
        for r in res.assignments.collect()
    }
    assert got == exp_z
    assert res.nchanges == exp_changes
    assert sum(res.topic_totals) == len(occs)


def test_lda_parallelism_invariant(spark, planted):
    """md5 draws + hash aggregations: assignments are identical at any
    partition count."""
    docs, toks, occs = planted
    a = lda(toks, k=2, alpha=ALPHA, beta=BETA, iterations=3,
            seed="t", num_partitions=2)
    b = lda(toks, k=2, alpha=ALPHA, beta=BETA, iterations=3,
            seed="t", num_partitions=7)
    ka = sorted(map(tuple, a.assignments.collect()))
    kb = sorted(map(tuple, b.assignments.collect()))
    assert ka == kb


def test_lda_recovers_planted_topics(spark, planted):
    """After enough sweeps the two disjoint vocabularies separate into
    the two topics: every doc nearly pure, topic top-words disjoint,
    and the joint log-likelihood improves over the init."""
    docs, toks, occs = planted
    W = len({w for _, w, _ in occs})
    res0 = lda(toks, k=2, alpha=ALPHA, beta=BETA, iterations=0, seed="t")
    res = lda(toks, k=2, alpha=ALPHA, beta=BETA, iterations=25, seed="t")
    assert log_likelihood(res, ALPHA, BETA, W, 2) > log_likelihood(
        res0, ALPHA, BETA, W, 2
    )
    # per-doc purity
    for row in res.doc_topics.collect():
        c = row["counts"]
        assert max(c) / sum(c) >= 0.9, (row["doc"], c)
    # the two vocabularies land in different topics
    tw = top_words(res, n=6).collect()
    by_topic = {}
    for r in tw:
        by_topic.setdefault(r["topic"], set()).add(r["word"])
    va = {"apple", "banana", "cherry", "grape", "melon", "peach"}
    assert len(by_topic) == 2
    sets = list(by_topic.values())
    assert (sets[0] <= va and sets[1].isdisjoint(va)) or (
        sets[1] <= va and sets[0].isdisjoint(va)
    )
    # late-chain churn is lower than early-chain churn
    assert res.nchanges[-1] < res.nchanges[0]


def test_lda_zero_iterations_is_init(spark, planted):
    docs, toks, occs = planted
    res = lda(toks, k=3, alpha=ALPHA, beta=BETA, iterations=0, seed="q")
    got = {
        (r["doc"], r["word"], r["occ"]): r["z"]
        for r in res.assignments.collect()
    }
    exp = {o: int(math.floor(_u("q", "init", *o) * 3)) for o in occs}
    assert got == exp
