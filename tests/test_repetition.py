"""Gopher-style repetition signals vs a pure-python replica."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from powergraph_spark.datapipe import repetition_filter, repetition_stats

DOCS = [
    # clean prose
    (1, "the quick brown fox jumps over the lazy dog and runs away"),
    # fully duplicated lines
    (2, "buy now\nbuy now\nbuy now\nbuy now"),
    # repeated paragraph boilerplate
    (3, "header text\n\nsame block here\n\nsame block here\n\nfooter"),
    # dominant bigram ("click here" x4)
    (4, "click here click here click here click here for the offer"),
    # repeated 5-gram run
    (5, "one two three four five one two three four five six seven"),
    # empty / whitespace-only
    (6, ""),
    (7, "   \n  \n"),
    # single token (no 2-grams)
    (8, "word"),
]


def _segs(text: str, pat: str) -> list[str]:
    return [s.strip() for s in re.split(pat, text) if s.strip() != ""]


def _toks(text: str) -> list[str]:
    # mirror the engine's tokens(): Spark trim strips SPACES only, and
    # Spark split keeps leading AND trailing empty fields
    t = text.strip(" ")
    if t == "":
        return []
    return [w.lower() for w in re.split(r"[ \t\n\r\f]+", t)]


def _grams(text: str, n: int) -> list[str]:
    t = _toks(text)
    return [" ".join(t[i:i + n]) for i in range(len(t) - n + 1)]


def _dup_frac(segs: list[str]) -> float:
    return (len(segs) - len(set(segs))) / len(segs) if segs else 0.0


def _dup_char_frac(segs: list[str]) -> float:
    tot = sum(map(len, segs))
    dist = sum(map(len, set(segs)))
    return (tot - dist) / tot if tot else 0.0


def _top_gram_frac(text: str, n: int) -> float:
    gs = _grams(text, n)
    if not gs or not text:
        return 0.0
    best = min(sorted(set(gs)), key=lambda g: (-gs.count(g), g))
    cnt = gs.count(best)
    return min(cnt * len(best) / len(text), 1.0) if cnt > 0 else 0.0


def _rep_gram_frac(text: str, n: int) -> float:
    gs = _grams(text, n)
    tot, dist = sum(map(len, gs)), sum(map(len, set(gs)))
    if not text or tot <= dist:
        return 0.0
    return min((tot - dist) / len(text), 1.0)


def test_repetition_stats_match_replica(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()
    }
    for doc_id, text in DOCS:
        g = got[doc_id]
        exp = {
            "dup_line_frac": _dup_frac(_segs(text, r"\n")),
            "dup_para_frac": _dup_frac(_segs(text, r"\n{2,}")),
            "dup_line_char_frac": _dup_char_frac(_segs(text, r"\n")),
            "top_2gram_frac": _top_gram_frac(text, 2),
            "top_3gram_frac": _top_gram_frac(text, 3),
            "rep_5gram_frac": _rep_gram_frac(text, 5),
        }
        for k, v in exp.items():
            assert abs(g[k] - round(v, 5)) < 1e-9, (doc_id, k, g[k], v)


def test_repetition_signals_fire_where_expected(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}
    assert got[2]["dup_line_frac"] == 0.75          # 3 of 4 lines repeats
    assert got[3]["dup_para_frac"] > 0.0
    assert got[4]["top_2gram_frac"] > 0.2
    assert got[5]["rep_5gram_frac"] > 0.0
    assert got[1]["dup_line_frac"] == 0.0
    assert got[6]["top_2gram_frac"] == 0.0 and got[8]["top_2gram_frac"] == 0.0


def test_repetition_filter_keeps_clean_drops_boilerplate(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    kept = {
        r["doc_id"]
        for r in df.filter(repetition_filter(F.col("text"))).collect()
    }
    assert 1 in kept and 6 in kept and 8 in kept
    assert 2 not in kept and 4 not in kept


def test_repetition_deterministic_across_partitions(spark):
    df = spark.createDataFrame(DOCS * 5, "doc_id long, text string")
    a = sorted(map(tuple, repetition_stats(df.repartition(1)).collect()))
    b = sorted(map(tuple, repetition_stats(df.repartition(8)).collect()))
    assert a == b
