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


def _py_simhash(text: str) -> str:
    """Independent python oracle of the md5-vote simhash spec."""
    import hashlib

    toks = sorted(set(text.split()))
    if not toks:
        return "0" * 16
    votes = [0] * 64
    for t in toks:
        h = hashlib.md5(t.encode()).hexdigest()
        for k in range(64):
            j, b = divmod(k, 4)
            bit = (int(h[j], 16) >> (3 - b)) & 1
            votes[k] += 1 if bit == 1 else -1
    out = []
    for j in range(16):
        nib = sum((8 >> b) for b in range(4) if votes[4 * j + b] > 0)
        out.append("0123456789abcdef"[nib])
    return "".join(out)


def test_simhash_hamming(docs, spark):
    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for did, fp in sh.items():
        assert fp == _py_simhash(texts[did]), did
    assert sh[0] == sh[1]

    def ham(a, b):
        return bin(int(a, 16) ^ int(b, 16)).count("1")

    d02 = ham(sh[0], sh[2])
    d05 = ham(sh[0], sh[5])
    assert d02 < d05  # near-dup closer than unrelated
    dups = simhash_near_dups(docs, max_hamming=max(3, d02)).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in dups}
    assert (0, 1) in pairs
    for r in dups:  # hamming column matches the python computation
        assert r["hamming"] == ham(sh[r["id_a"]], sh[r["id_b"]])


def test_simhash_empty_doc(spark):
    df = spark.createDataFrame([(1, ""), (2, "   "), (3, "x y")],
                               "doc_id long, text string")
    got = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    assert got[1] == "0" * 16 and got[2] == "0" * 16
    assert got[3] == _py_simhash("x y")


def test_minhash_bucket_cap_bounds_pairs(spark):
    # a planted boilerplate bucket: 50 identical docs + 2 near-dups.
    rows = [(i, "the same boilerplate text repeated here") for i in range(50)]
    rows += [(100, "unique alpha beta gamma delta epsilon zeta"),
             (101, "unique alpha beta gamma delta epsilon eta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = minhash_lsh_candidates(df, num_hashes=32, bands=16, k=3,
                                    max_bucket=10)
    pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    # the 50-doc boilerplate bucket (size > 10) is dropped entirely…
    assert not any(a < 50 and b < 50 for a, b in pairs)
    # …while the small bucket still yields its candidate pair
    assert (100, 101) in pairs
    # uncapped emits the 50*49/2 boilerplate pairs
    full = minhash_lsh_candidates(df, num_hashes=32, bands=16, k=3,
                                  max_bucket=None)
    assert full.count() == 50 * 49 // 2 + 1


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


def test_ann_realistic_dim_plan_bounded(spark):
    """The ANN family at a REAL embedding width (dim 768): hyperplanes/
    centroids ship as one nested-array literal, so plan analysis stays
    bounded (the per-element literal form was ~12k expression nodes for
    LSH and ~50k for IVF — interpreted-codegen fallback plus seconds of
    driver-side analysis, VERDICT r3). Bucket bits are checked against
    numpy so the compact encoding is exact, not just fast."""
    import time

    from powergraph_spark.datapipe.similarity import (
        _bucket_expr,
        _hyperplanes,
    )

    dim, n, n_planes = 768, 60, 8
    rng = np.random.RandomState(3)
    base = rng.randn(n, dim).astype(np.float32)
    rows = [Row(vec_id=i, embedding=[float(x) for x in base[i]])
            for i in range(n)]
    vecs = spark.createDataFrame(rows).persist()
    qs = vecs.limit(5)

    t0 = time.time()
    lsh = lsh_topk(vecs, qs, k=5, n_planes=n_planes)
    ivf = ivf_topk(vecs, qs, k=5, n_cells=16, nprobe=4)
    _ = lsh.schema, ivf.schema  # force analysis
    build_sec = time.time() - t0
    assert build_sec < 15, f"ANN plan analysis took {build_sec:.1f}s at dim {dim}"

    # candidate sets are sparse at 60 vectors / 256 LSH buckets — the
    # point here is that both plans EXECUTE, not their recall
    assert lsh.count() >= 5 and ivf.count() >= 5

    planes = _hyperplanes(dim, n_planes, 42)
    got = {
        r["vec_id"]: r["b"]
        for r in vecs.select(
            "vec_id", _bucket_expr(F.col("embedding"), planes).alias("b")
        ).collect()
    }
    for i in range(n):
        exp = sum(
            1 << j for j in range(n_planes)
            if float(np.dot(planes[j], base[i].astype(np.float64))) >= 0
        )
        assert got[i] == exp, i
    vecs.unpersist()


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
        # image/audio payloads are REAL formats (P5 netpbm / PCM WAV)
        # and take the real decode path; video has no lib-free codec
        expected = {"image": "decode:netpbm", "audio": "decode:wav-pcm",
                    "video": "raw-fallback:video"}[r["kind"]]
        assert r["note"] == expected, r

    thumbs = resize_images(media, out_w=8, out_h=8).collect()
    assert len(thumbs) == 10
    assert all(len(bytes(r["thumb"])) == 64 for r in thumbs)

    frames = sample_frames(media, every_n=10).collect()
    assert len(frames) == 10 * 3  # 30 frames / every 10 per video

    # determinism across parallelism
    a = sorted(tuple(r) for r in synthesize_media(spark, 20, partitions=1).collect())
    b = sorted(tuple(r) for r in synthesize_media(spark, 20, partitions=5).collect())
    assert a == b


def test_codec_roundtrips():
    """Real codec paths: P5 netpbm and PCM WAV encode->decode are
    byte/sample-exact (no media libraries involved)."""
    import numpy as np

    from powergraph_spark.datapipe.multimodal import (
        decode_audio,
        decode_image,
        encode_pgm,
        encode_wav_pcm16,
    )

    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(13, 17), dtype=np.uint8)
    assert (decode_image(encode_pgm(img)) == img).all()
    # P6 RGB with a header comment
    rgb = rng.randint(0, 256, size=(4, 5, 3), dtype=np.uint8)
    p6 = b"P6\n# comment\n5 4\n255\n" + rgb.tobytes()
    assert (decode_image(p6) == rgb).all()
    assert decode_image(b"\xff\xd8\xff\xe0 not netpbm") is None

    samples = (rng.randn(300) * 8000).clip(-32768, 32767).astype(np.int16)
    dec, rate = decode_audio(encode_wav_pcm16(samples, 16000))
    assert rate == 16000
    assert np.allclose(dec * 32768.0, samples, atol=0.51)
    assert decode_audio(b"not a riff") is None


# ------------------------------------------------------ pii / decontam
def test_redact_pii_and_counts(spark):
    from powergraph_spark.datapipe.text import pii_counts, redact_pii

    rows = [
        (1, "mail me at alice.smith+x@sub.example.org today"),
        (2, "server 192.168.1.254 and phone +1-555-123-4567"),
        (3, "ssn 123-45-6789 embedded"),
        (4, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in df.select(
            "doc_id", redact_pii(F.col("text")).alias("red"),
            *pii_counts(F.col("text"))
        ).collect()
    }
    assert out[1]["red"] == "mail me at <EMAIL> today"
    assert out[1]["n_email"] == 1
    assert out[2]["red"] == "server <IP> and phone <PHONE>"
    assert out[2]["n_ipv4"] == 1 and out[2]["n_phone"] == 1
    assert out[3]["red"] == "ssn <SSN> embedded"
    assert out[3]["n_ssn"] == 1
    assert out[4]["red"] == rows[3][1]
    assert all(out[4][k] == 0 for k in ("n_email", "n_ipv4", "n_phone", "n_ssn"))


def test_contamination_and_decontaminate(spark):
    from powergraph_spark.datapipe import contamination, decontaminate

    bench = spark.createDataFrame(
        [(0, "the secret benchmark question about spark shuffles here")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # full copy of the benchmark sentence (leak)
            (10, "prefix words the secret benchmark question about spark shuffles here suffix"),
            # shares exactly one 4-gram
            (11, "unrelated opening the secret benchmark question closes differently"),
            (12, "completely disjoint text with no overlap at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    c = {
        (r["doc_id"], r["bench_id"]): r.asDict()
        for r in contamination(corpus, bench, k=4).collect()
    }
    assert (12, 0) not in c
    assert c[(10, 0)]["overlap_frac"] == 1.0  # all 5 bench 4-grams covered
    assert c[(11, 0)]["n_shared"] == 1
    kept = sorted(r["doc_id"] for r in
                  decontaminate(corpus, bench, k=4, max_overlap_frac=0.5).collect())
    assert kept == [11, 12]


# ---------------------------------------------- cross-doc span dedup


def test_span_dup_stats_hand_computed(spark):
    """k=4, min_count=2: doc0/doc3 are exact dups (all five 4-gram
    intervals duplicated, union covers all 8 tokens); doc1 shares only
    its leading 4-gram with them; doc2 is unique; doc4 is empty."""
    from powergraph_spark.datapipe import span_dup_stats

    docs = spark.createDataFrame(
        [
            (0, "a b c d e f g h"),
            (1, "a b c d x y z w"),
            (2, "q r s t u v"),
            (3, "a b c d e f g h"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["dup_frac"])
        for r in span_dup_stats(docs, k=4).collect()
    }
    assert got == {
        0: (8, 8, 1.0),
        1: (8, 4, 0.5),
        2: (6, 0, 0.0),
        3: (8, 8, 1.0),
        4: (0, 0, 0.0),
    }


def test_span_dup_overlap_union_not_double_counted(spark):
    """Within-doc repetition: 'a b a b a b a b' has 4-grams at pos
    0..4, all equal in PAIRS ((0,2,4)='a b a b'... actually grams at
    even/odd positions alternate between 'a b a b' and 'b a b a', each
    occurring >=2 times) -> the union must cover the whole doc exactly
    once (8 tokens), not sum interval lengths (20)."""
    from powergraph_spark.datapipe import span_dup_stats

    docs = spark.createDataFrame(
        [(0, "a b a b a b a b")], ["doc_id", "text"]
    )
    row = span_dup_stats(docs, k=4).collect()[0]
    assert (row["n_tokens"], row["dup_tokens"], row["dup_frac"]) == (8, 8, 1.0)


def test_span_dedup_filter_drops_heavy_dups(spark):
    from powergraph_spark.datapipe import span_dedup_filter

    docs = spark.createDataFrame(
        [
            (0, "a b c d e f g h"),
            (1, "a b c d x y z w"),
            (2, "q r s t u v"),
            (3, "a b c d e f g h"),
        ],
        ["doc_id", "text"],
    )
    kept = sorted(
        r["doc_id"]
        for r in span_dedup_filter(docs, max_dup_frac=0.5, k=4).collect()
    )
    assert kept == [1, 2]


def test_span_dedup_rewrite_keeps_first_occurrence(spark):
    """Owner = min (doc_id, pos): doc0 keeps all text, doc3 (its exact
    dup) is fully excised, doc1 loses only the shared leading 4-gram,
    unique and empty docs pass through."""
    from powergraph_spark.datapipe import span_dedup_rewrite

    docs = spark.createDataFrame(
        [
            (0, "a b c d e f g h"),
            (1, "a b c d x y z w"),
            (2, "q r s t u v"),
            (3, "a b c d e f g h"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["text"]
           for r in span_dedup_rewrite(docs, k=4).collect()}
    assert got == {
        0: "a b c d e f g h",
        1: "x y z w",
        2: "q r s t u v",
        3: "",
        4: "",
    }


def test_span_dedup_rewrite_within_doc_repetition(spark):
    """'a b a b a b a b': removable non-owner occurrences union to
    [2,8) — the first period survives, the echo is excised."""
    from powergraph_spark.datapipe import span_dedup_rewrite

    docs = spark.createDataFrame([(0, "a b a b a b a b")],
                                 ["doc_id", "text"])
    assert span_dedup_rewrite(docs, k=4).collect()[0]["text"] == "a b"


def test_span_dedup_rewrite_partition_invariant(spark):
    """Same rewrite at 1 and 7 input partitions (ownership is a global
    min, not an arrival-order artifact)."""
    from powergraph_spark.datapipe import span_dedup_rewrite

    rows = [(i, "w x y z " + f"u{i} " * 3) for i in range(6)]
    rows += [(10 + i, "w x y z p q r s") for i in range(3)]
    a = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(1)
    b = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(7)
    ga = sorted(map(tuple, span_dedup_rewrite(a, k=4).collect()))
    gb = sorted(map(tuple, span_dedup_rewrite(b, k=4).collect()))
    assert ga == gb
