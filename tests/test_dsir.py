"""DSIR importance resampling vs an independent python replica of the
same deterministic contract (md5 hashed-unigram log-ratios + Gumbel
top-n). No reference counterpart — datapipe extension, see
powergraph_spark/datapipe/dsir.py docstring."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Row

from powergraph_spark.datapipe.dsir import (
    hashed_unigram_logratio,
    importance_resample,
    importance_scores,
)


def _bucket(tok: str, dim: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % dim


def _py_logratio(raw_texts, tgt_texts, dim, alpha=1.0):
    def counts(texts):
        c = [0] * dim
        for t in texts:
            for tok in t.split():
                c[_bucket(tok, dim)] += 1
        return c

    ct, cr = counts(tgt_texts), counts(raw_texts)
    tt, tr = float(sum(ct)), float(sum(cr))
    return [
        math.log((ct[j] + alpha) / (tt + alpha * dim))
        - math.log((cr[j] + alpha) / (tr + alpha * dim))
        for j in range(dim)
    ]


def _py_score(text, logr, dim):
    s = 0.0
    for tok in text.split():
        s += logr[_bucket(tok, dim)]
    return s


def _py_gumbel(doc_id, seed):
    u32 = int(
        hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()[:8], 16
    )
    u = (u32 + 0.5) / 4294967296.0
    return -math.log(-math.log(u))


_RAW = [
    (0, "the cat sat on the mat", "en"),
    (1, "le chat est sur le tapis rouge", "fr"),
    (2, "the dog ate the homework today", "en"),
    (3, "der hund frisst die hausaufgaben schnell", "de"),
    (4, "a cat and a dog and a mat", "en"),
    (5, "un perro grande come la tarea", "es"),
    (6, "the the the cat cat dog", "en"),
    (7, "", "en"),
    (8, "chat tapis chien rouge grand", "fr"),
    (9, "mat dog cat the on sat", "en"),
]


def test_logratio_and_scores_match_python(spark):
    dim = 16
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=lg) for i, t, lg in _RAW]
    )
    tgt = df.filter("lang = 'en'")
    logr = hashed_unigram_logratio(df, tgt, dim=dim)
    exp = _py_logratio(
        [t for _, t, _ in _RAW],
        [t for _, t, lg in _RAW if lg == "en"],
        dim,
    )
    assert all(abs(a - b) < 1e-12 for a, b in zip(logr, exp))

    scored = {
        r["doc_id"]: r["iw_score"]
        for r in importance_scores(df, logr).collect()
    }
    for i, t, _ in _RAW:
        assert abs(scored[i] - _py_score(t, exp, dim)) < 1e-9
    assert scored[7] == 0.0  # empty doc


def test_resample_topn_matches_python_and_is_partition_invariant(spark):
    dim, n, seed = 16, 4, "t1"
    rows = [Row(doc_id=i, text=t, lang=lg) for i, t, lg in _RAW]
    logr = _py_logratio(
        [t for _, t, _ in _RAW],
        [t for _, t, lg in _RAW if lg == "en"],
        dim,
    )
    keys = {
        i: _py_score(t, logr, dim) + _py_gumbel(i, seed)
        for i, t, _ in _RAW
    }
    exp_ids = [
        i for i, _ in sorted(keys.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:n]

    for parts in (2, 16):
        df = spark.createDataFrame(rows).repartition(parts)
        sel = importance_resample(
            df, df.filter("lang = 'en'"), n=n, dim=dim, seed=seed
        ).collect()
        assert sorted(r["doc_id"] for r in sel) == sorted(exp_ids)
        for r in sel:
            assert abs(r["gumbel_key"] - keys[r["doc_id"]]) < 1e-9
        # selected rows carry the original columns
        assert {"doc_id", "text", "lang"} <= set(sel[0].asDict())


def test_resample_prefers_target_like_docs(spark):
    """With an English target, English docs out-rank non-English ones
    on average: the top half of the selection by iw_score must contain
    more en than non-en docs."""
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=lg) for i, t, lg in _RAW]
    )
    scored = importance_scores(
        df,
        hashed_unigram_logratio(df, df.filter("lang = 'en'"), dim=32),
    ).collect()
    by_score = sorted(scored, key=lambda r: -r["iw_score"])
    nonempty = [r for r in by_score if r["text"]]
    top = nonempty[: len(nonempty) // 2]
    assert sum(r["lang"] == "en" for r in top) > len(top) / 2
