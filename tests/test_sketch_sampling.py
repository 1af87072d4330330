"""HLL distinct sketch, stratified sampling, perplexity bucketing —
python replicas + property tests. Datapipe extensions, no reference
counterpart (see the module docstrings for the public sources)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from powergraph_spark.datapipe.sketch import (
    _alpha,
    hll_distinct,
    hll_estimate,
    hll_registers,
)
from powergraph_spark.datapipe.clean import stratified_sample
from powergraph_spark.datapipe.text import ppl_buckets, ppl_cutoffs


def _py_hll(keys, b):
    m = 1 << b
    wbits = 32 - b
    regs = {}
    for k in keys:
        h = int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)
        idx, w = h % m, h // m
        rho = (wbits - w.bit_length() + 1) if w > 0 else wbits + 1
        regs[idx] = max(regs.get(idx, 0), rho)
    z = sum(2.0 ** -r for r in regs.values()) + (m - len(regs))
    raw = _alpha(m) * m * m / z
    zeros = m - len(regs)
    if raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return raw


def test_hll_matches_python_and_is_accurate(spark):
    n = 5000
    rows = [Row(g="a", k=f"key-{i}") for i in range(n)]
    rows += [Row(g="b", k=f"other-{i % 97}") for i in range(1000)]
    df = spark.createDataFrame(rows)
    got = {
        r["g"]: r["est"]
        for r in hll_distinct(df, ["g"], "k", b=10).collect()
    }
    exp_a = _py_hll([f"key-{i}" for i in range(n)], 10)
    exp_b = _py_hll([f"other-{i % 97}" for i in range(1000)], 10)
    assert abs(got["a"] - round(exp_a, 4)) < 1e-9
    assert abs(got["b"] - round(exp_b, 4)) < 1e-9
    # estimator quality: ~1.04/sqrt(1024) ≈ 3.3% std err
    assert abs(got["a"] - n) / n < 0.15
    assert abs(got["b"] - 97) / 97 < 0.15


def test_hll_registers_merge_equals_recompute(spark):
    rows1 = [Row(g="x", k=f"k{i}") for i in range(800)]
    rows2 = [Row(g="x", k=f"k{i}") for i in range(400, 1200)]
    r1 = hll_registers(spark.createDataFrame(rows1), ["g"], "k", b=8)
    r2 = hll_registers(spark.createDataFrame(rows2), ["g"], "k", b=8)
    merged = (
        r1.unionAll(r2).groupBy("g", "idx").agg(F.max("rho").alias("rho"))
    )
    est_merged = hll_estimate(merged, ["g"], b=8).first()["est"]
    whole = hll_distinct(
        spark.createDataFrame(rows1 + rows2), ["g"], "k", b=8
    ).first()["est"]
    assert est_merged == whole


def test_stratified_sample_exact_n_and_deterministic(spark):
    rows = [
        Row(doc_id=i, lang=["en", "fr", "de"][i % 3]) for i in range(90)
    ] + [Row(doc_id=1000, lang="tiny")]
    for parts in (2, 16):
        df = spark.createDataFrame(rows).repartition(parts)
        out = stratified_sample(df, "lang", n_per=5, seed="s1").collect()
        by = {}
        for r in out:
            by.setdefault(r["lang"], set()).add(r["doc_id"])
        assert {k: len(v) for k, v in by.items()} == {
            "en": 5, "fr": 5, "de": 5, "tiny": 1
        }
        if parts == 2:
            first = by
        else:
            assert by == first  # parallelism-invariant selection
    # bottom-k property: selected draws are the stratum's smallest
    import hashlib as hl

    def u(i):
        return int(
            hl.md5(f"s1:{i}".encode()).hexdigest()[:8], 16
        ) / 4294967296.0

    en_all = sorted(
        (u(r.doc_id), r.doc_id) for r in rows if r.lang == "en"
    )
    assert {i for _, i in en_all[:5]} == first["en"]


def test_ppl_buckets_partitions_and_cutoffs(spark):
    texts = [
        "the cat sat on the mat and the cat sat again",
        "the cat sat on the mat",
        "zq xv bnm qwerty zzz plonk",
        "the dog sat on the mat",
        "cat mat the on sat",
    ]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    cuts = ppl_cutoffs(docs)
    assert cuts[0] <= cuts[1]
    out = ppl_buckets(docs, cutoffs=cuts).collect()
    assert len(out) == len(texts)
    got = {r["doc_id"]: r["bucket"] for r in out}
    assert set(got.values()) <= {"head", "middle", "tail"}
    # buckets agree with the returned scores and cutoffs
    for r in out:
        s = r["avg_logprob"]
        exp = (
            "head" if s >= cuts[1]
            else "middle" if s >= cuts[0] else "tail"
        )
        assert got[r["doc_id"]] == exp
    # doc 4 re-orders common words into unseen bigrams -> backoff
    # penalties; doc 0 repeats frequent bigrams -> near-zero logprobs.
    # (doc 2's singleton words score ln(1/1)=0 under a self-trained
    # LM — the known self-training quirk, so it is not compared.)
    scores = {r["doc_id"]: r["avg_logprob"] for r in out}
    assert scores[4] < scores[0]


def test_mixture_quotas_and_sample(spark):
    from powergraph_spark.datapipe import mixture_quotas, mixture_sample

    assert mixture_quotas({"a": 0.5, "b": 0.3, "c": 0.2}, 10) == {
        "a": 5, "b": 3, "c": 2
    }
    # largest remainder: 7*0.5=3.5, 7*0.3=2.1, 7*0.2=1.4 -> 3,2,1 + 1
    # to the largest remainder (a: .5)
    assert mixture_quotas({"a": 0.5, "b": 0.3, "c": 0.2}, 7) == {
        "a": 4, "b": 2, "c": 1
    }
    rows = [
        Row(doc_id=i, lang=["en", "fr", "de"][i % 3]) for i in range(60)
    ]
    for parts in (2, 16):
        df = spark.createDataFrame(rows).repartition(parts)
        out = mixture_sample(
            df, {"en": 0.7, "fr": 0.3}, n=10, seed="m1"
        ).collect()
        got = {}
        for r in out:
            got.setdefault(r["lang"], set()).add(r["doc_id"])
        assert {k: len(v) for k, v in got.items()} == {"en": 7, "fr": 3}
        if parts == 2:
            first = got
        else:
            assert got == first
    # undersized stratum caps, never backfills
    tiny = spark.createDataFrame(
        [Row(doc_id=0, lang="en"), Row(doc_id=1, lang="fr")]
    )
    out = mixture_sample(tiny, {"en": 0.9, "fr": 0.1}, n=10).collect()
    assert sorted(r["lang"] for r in out) == ["en", "fr"]


def test_blocklist_filter_subdomain_semantics(spark):
    from powergraph_spark.webtext.urls import blocklist_filter

    rows = [
        Row(doc_id=0, url="http://bad.com/x"),          # blocked exact
        Row(doc_id=1, url="https://a.b.bad.com/y"),     # blocked subdomain
        Row(doc_id=2, url="http://notbad.com/z"),       # suffix but no dot
        Row(doc_id=3, url="http://good.org/w"),
        Row(doc_id=4, url="HTTP://BAD.COM:80/caps"),    # canonicalized
        Row(doc_id=5, url="http://bad.com.evil.net/"),  # bad.com not the host tail
    ]
    df = spark.createDataFrame(rows)
    kept = {r["doc_id"] for r in
            blocklist_filter(df, ["bad.com"]).collect()}
    assert kept == {2, 3, 5}
    dropped = {r["doc_id"] for r in
               blocklist_filter(df, ["bad.com"], keep_blocked=True)
               .collect()}
    assert dropped == {0, 1, 4}
