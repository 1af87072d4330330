from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from powergraph_spark.datapipe import (
    brute_force_topk,
    dedup_exact,
    embedding_near_dups,
    exact_dup_groups,
    extract_features,
    ivf_topk,
    jaccard_pairs,
    lsh_topk,
    minhash_dedup,
    minhash_lsh_candidates,
    resize_images,
    sample_frames,
    simhash,
    simhash_near_dups,
    synthesize_media,
    text_stats,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog and runs away fast", "en"),
    (1, "the quick brown fox jumps over the lazy dog and runs away fast", "en"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat and runs away fast", "en"),  # near dup of 0
    (3, "der hund läuft und die katze ist nicht da mit einem ball", "de"),
    (4, "le chat est dans la maison et le chien est pour dans", "fr"),
    (5, "completely different content about spark dataframes and shuffles here", "en"),
    (6, "", "und"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=lang) for i, t, lang in DOCS]
    ).persist()


# ------------------------------------------------------------------ text
def test_token_count_and_stats(docs):
    st = {r["doc_id"]: r.asDict() for r in text_stats(docs).collect()}
    for i, t, _ in DOCS:
        assert st[i]["n_tokens"] == len(t.split()), i
        assert st[i]["n_chars_computed"] == len(t)
        assert 0.0 <= st[i]["quality"] <= 1.0
        assert 0.0 <= st[i]["stopword_ratio"] <= 1.0
    assert st[6]["n_tokens"] == 0


def test_lang_id_heuristic(docs):
    got = {r["doc_id"]: r["lang_pred"] for r in text_stats(docs).collect()}
    assert got[0] == "en" and got[1] == "en"
    assert got[3] == "de"
    assert got[4] == "fr"
    assert got[6] == "und"


def test_fingerprint_equal_for_equal_text(docs):
    fp = {r["doc_id"]: r["fingerprint"] for r in text_stats(docs).collect()}
    assert fp[0] == fp[1]
    assert fp[0] != fp[5]


# ----------------------------------------------------------------- dedup
def test_exact_dup_groups(docs):
    groups = exact_dup_groups(docs).collect()
    assert len(groups) == 1
    assert groups[0]["n_dups"] == 2 and groups[0]["keep_id"] == 0


def test_dedup_exact_keeps_min_id(docs):
    kept = sorted(r["doc_id"] for r in dedup_exact(docs).collect())
    assert kept == [0, 2, 3, 4, 5, 6]


def test_minhash_finds_near_dup(docs):
    cands = minhash_lsh_candidates(docs, num_hashes=32, bands=16, k=3)
    pairs = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    assert (0, 1) in pairs  # identical docs always collide
    assert (0, 2) in pairs  # near dup collides with 16 bands of 2 rows
    jac = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in jaccard_pairs(docs, cands, k=3).collect()}
    assert jac[(0, 1)] == 1.0
    assert 0.5 < jac[(0, 2)] < 1.0


def test_minhash_dedup_pipeline(docs):
    kept = sorted(
        r["doc_id"]
        for r in minhash_dedup(docs, threshold=0.5, num_hashes=32, bands=16).collect()
    )
    # 0,1,2 cluster -> keep 0
    assert kept == [0, 3, 4, 5, 6]


def test_simhash_hamming(docs, spark):
    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert sh[0] == sh[1]
    d02 = bin(sh[0] ^ sh[2]).count("1")
    d05 = bin(sh[0] ^ sh[5]).count("1")
    assert d02 < d05  # near-dup closer than unrelated
    dups = {(r["id_a"], r["id_b"]) for r in
            simhash_near_dups(docs, max_hamming=max(3, d02)).collect()}
    assert (0, 1) in dups


# ------------------------------------------------------------ similarity
@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(7)
    base = rng.randn(40, 16).astype(np.float32)
    base[1] = base[0] + 0.01 * rng.randn(16).astype(np.float32)  # near-dup pair
    rows = [Row(vec_id=i, embedding=[float(x) for x in base[i]]) for i in range(40)]
    return spark.createDataFrame(rows).persist()


def _np_topk(base_rows, qid, k):
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in base_rows}
    q = vecs[qid]
    sims = {
        i: float(np.dot(q, v) / (np.linalg.norm(q) * np.linalg.norm(v)))
        for i, v in vecs.items() if i != qid
    }
    return [i for i, _ in sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:k]]


def test_brute_force_topk_matches_numpy(vectors):
    qs = vectors.filter(F.col("vec_id") < 3)
    got = brute_force_topk(vectors, qs, k=5).collect()
    rows = vectors.collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    for qid in (0, 1, 2):
        ours = [n for _, n in sorted(by_q[qid])]
        assert ours == _np_topk(rows, qid, 5), qid


def test_lsh_topk_recall(vectors):
    qs = vectors.limit(10)
    exact = brute_force_topk(vectors, qs, k=5).collect()
    approx = lsh_topk(vectors, qs, k=5, n_planes=4).collect()
    e = {(r["query_id"], r["neighbor_id"]) for r in exact}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(e & a) / len(e)
    assert recall >= 0.4  # single-probe, 4 planes on random gaussians


def test_ivf_topk_recall(vectors):
    qs = vectors.limit(10)
    exact = brute_force_topk(vectors, qs, k=5).collect()
    approx = ivf_topk(vectors, qs, k=5, n_cells=8, nprobe=4).collect()
    e = {(r["query_id"], r["neighbor_id"]) for r in exact}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx}
    assert len(e & a) / len(e) >= 0.5


def test_embedding_near_dups(vectors):
    pairs = {(r["id_a"], r["id_b"]): r["sim"]
             for r in embedding_near_dups(vectors, threshold=0.9).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.99


# ------------------------------------------------------------ multimodal
def test_media_plumbing(spark):
    media = synthesize_media(spark, 30).persist()
    kinds = Counter(r["kind"] for r in media.select("kind").collect())
    assert kinds == {"image": 10, "audio": 10, "video": 10}

    feats = extract_features(media, dim=8).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r["feature"]) == 8
        assert r["note"].startswith("stub-decode:")

    thumbs = resize_images(media, out_w=8, out_h=8).collect()
    assert len(thumbs) == 10
    assert all(len(bytes(r["thumb"])) == 64 for r in thumbs)

    frames = sample_frames(media, every_n=10).collect()
    assert len(frames) == 10 * 3  # 30 frames / every 10 per video

    # determinism across parallelism
    a = sorted(tuple(r) for r in synthesize_media(spark, 20, partitions=1).collect())
    b = sorted(tuple(r) for r in synthesize_media(spark, 20, partitions=5).collect())
    assert a == b
