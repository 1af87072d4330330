"""Perceptual image dedup (aHash + pigeonhole Hamming join) vs an
independent python replica. Datapipe extension — see
powergraph_spark/datapipe/multimodal.py (perceptual dedup section)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import Row
from pyspark.sql import functions as F

from powergraph_spark.datapipe.multimodal import (
    encode_pgm,
    image_ahash,
    image_near_dups,
    synthesize_media,
)


def _py_ahash(img: np.ndarray, grid: int = 8) -> str:
    """Independent replica: same pooling boundaries, different code
    path (python loops, not reduceat)."""
    img = img.astype(np.float64)
    h, w = img.shape
    cells = np.empty((grid, grid))
    for i in range(grid):
        for j in range(grid):
            y0, y1 = (i * h) // grid, ((i + 1) * h) // grid if i < grid - 1 else h
            x0, x1 = (j * w) // grid, ((j + 1) * w) // grid if j < grid - 1 else w
            cells[i, j] = img[y0:y1, x0:x1].mean()
    bits = (cells > cells.mean()).flatten()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return format(v, "016x")


def _media_row(mid: int, img: np.ndarray) -> Row:
    h, w = img.shape
    return Row(media_id=mid, kind="image", payload=bytearray(encode_pgm(img)),
               width=w, height=h, sample_rate=0, n_frames=1)


def test_ahash_matches_python_replica(spark):
    rng = np.random.RandomState(3)
    rows, exp = [], {}
    for mid in range(12):
        img = rng.randint(0, 256, size=(40 + mid, 56 + mid), dtype=np.uint8)
        rows.append(_media_row(mid, img))
        exp[mid] = _py_ahash(img)
    rows.append(Row(media_id=99, kind="audio", payload=bytearray(b"x"),
                    width=0, height=0, sample_rate=1, n_frames=0))
    df = spark.createDataFrame(rows)
    got = {r["media_id"]: r["ahash"] for r in image_ahash(df).collect()}
    assert got == exp  # audio row dropped, every image hash exact


def test_near_dups_find_planted_pairs(spark):
    # base: half-black/half-white split -> crisp cell pattern
    img = np.zeros((64, 64), dtype=np.uint8)
    img[:, 32:] = 255
    # twin: tiny noise that flips no pooled cell across the mean
    twin = img.copy()
    twin[0, 0] = 3
    # variant: one pooled cell (top-left 8x8 block) pushed above mean
    variant = img.copy()
    variant[:8, :8] = 255
    # unrelated: inverted checkerboard of 16px squares
    other = np.zeros((64, 64), dtype=np.uint8)
    for i in range(0, 64, 32):
        other[i:i + 16, :] = 255
    rows = [_media_row(0, img), _media_row(1, twin),
            _media_row(2, variant), _media_row(3, other)]
    df = spark.createDataFrame(rows)

    h = {i: _py_ahash(a) for i, a in
         [(0, img), (1, twin), (2, variant), (3, other)]}

    def ham(a, b):
        return bin(int(h[a], 16) ^ int(h[b], 16)).count("1")

    exp = {
        (a, b): ham(a, b)
        for a in range(4) for b in range(a + 1, 4)
        if ham(a, b) <= 2
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_dups(df, max_hamming=2).collect()
    }
    assert got == exp
    assert got[(0, 1)] == 0          # noise twin is an exact hash dup
    assert got[(0, 2)] == 1          # single-cell variant at hamming 1
    assert (0, 3) not in got and (1, 3) not in got


def test_near_dups_on_synthetic_corpus_and_partition_invariance(spark):
    m1 = synthesize_media(spark, 60, seed=7)
    m2 = synthesize_media(spark, 60, seed=7).withColumn(
        "media_id", F.col("media_id") + 10000
    )
    both = m1.unionAll(m2)
    a = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in image_near_dups(both, max_hamming=0).collect()
    )
    # every synthesized image (ids = 0 mod 3) pairs with its shifted twin
    img_ids = [i for i in range(60) if i % 3 == 0]
    for i in img_ids:
        assert (i, i + 10000, 0) in a
    b = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in image_near_dups(
            both.repartition(16), max_hamming=0
        ).collect()
    )
    assert a == b
