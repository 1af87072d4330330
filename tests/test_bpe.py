"""BPE merge training vs an independent python replica of the
classic Sennrich-et-al. algorithm (word-frequency table, overlapping
pair counts, greedy leftmost non-overlapping merge). No reference
counterpart — datapipe extension, see powergraph_spark/datapipe/bpe.py."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Row
from pyspark.sql import functions as F

from powergraph_spark.datapipe.bpe import bpe_segment, bpe_train


def _py_merge_word(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _py_bpe(texts, n_merges):
    vocab = Counter()
    for t in texts:
        for w in t.split():
            vocab[tuple(list(w) + ["</w>"])] += 1
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, cnt in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += cnt
        if not pairs:
            break
        # max count, ties -> lexicographically smallest (a, b)
        (a, b), c = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if c < 2:
            break
        merges.append((a, b, c))
        vocab = Counter(
            {_py_merge_word(s, a, b): n for s, n in vocab.items()}
        )
    return merges, vocab


_TEXTS = [
    "low lower lowest low low",
    "new newer newest new",
    "wide wider widest",
    "low newer low wide",
    "aaaa aaa aa baaab",  # greedy non-overlap stress
    "",
]


def test_bpe_matches_python_replica(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(_TEXTS)]
    )
    res = bpe_train(docs, n_merges=6)
    exp_merges, exp_vocab = _py_bpe(_TEXTS, 6)
    assert res.merges == exp_merges
    got_vocab = {
        tuple(r["syms"]): r["cnt"]
        for r in res.vocab.collect()
    }
    # python replica keys by symbol tuple; engine keys by word — both
    # must agree on every word's final segmentation and count
    assert got_vocab == dict(exp_vocab)


def test_bpe_parallelism_invariance(spark):
    rows = [Row(doc_id=i, text=t) for i, t in enumerate(_TEXTS)]
    a = bpe_train(spark.createDataFrame(rows).repartition(2), 4).merges
    b = bpe_train(spark.createDataFrame(rows).repartition(16), 4).merges
    assert a == b


def test_bpe_segment_applies_merges_in_rank_order(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(_TEXTS)]
    )
    res = bpe_train(docs, n_merges=4)
    seg = spark.createDataFrame([Row(text="low newest aaaa")]).select(
        bpe_segment(F.col("text"), res.merges).alias("s")
    ).first()["s"]
    # replica: segment each word under the same merges in rank order
    exp = []
    for w in "low newest aaaa".split():
        syms = tuple(list(w) + ["</w>"])
        for a, b, _ in res.merges:
            syms = _py_merge_word(syms, a, b)
        exp.append(list(syms))
    assert [list(x) for x in seg] == exp


def test_bpe_early_stop_on_singleton_pairs(spark):
    docs = spark.createDataFrame([Row(doc_id=0, text="ab cd ef")])
    res = bpe_train(docs, n_merges=10)
    # every pair occurs once -> no merge reaches the >=2 bar
    assert res.merges == []
