"""Implicit-feedback rating augmentation (implicit.hpp) tests."""

from __future__ import annotations

import hashlib

import pytest

from powergraph_spark.algorithms import add_implicit_ratings, als, ratings_graph

SEED = "imptest"
M, N, PCT, VALUE = 40, 25, 0.05, 2.5  # toadd = 50

RATINGS = [(1, 3, 4.0), (2, 3, 1.0), (1, 5, 3.0)]


def _u(tag: str, j: int) -> float:
    h = hashlib.md5(f"{SEED}:{tag}:{j}".encode()).hexdigest()
    return int(h[:8], 16) / 16 ** 8


def _expected_pairs(toadd: int) -> list[tuple[int, int]]:
    return [
        (int(_u("u", j) * M), int(_u("i", j) * N)) for j in range(toadd)
    ]


def _base(spark):
    return spark.createDataFrame(
        RATINGS, "user long, item long, rating double"
    )


def test_augmentation_matches_replica_and_counts(spark):
    toadd = int(PCT * M * N)
    aug = add_implicit_ratings(_base(spark), M, N, PCT, value=VALUE, seed=SEED)
    rows = aug.collect()
    assert len(rows) == len(RATINGS) + toadd
    implicit = [
        (r["user"], r["item"]) for r in rows if r["rating"] == VALUE
    ]
    assert sorted(implicit) == sorted(_expected_pairs(toadd))
    assert all(0 <= u < M and 0 <= i < N for u, i in implicit)


def test_augmentation_parallelism_invariant(spark):
    a = sorted(
        map(tuple, add_implicit_ratings(
            _base(spark).repartition(1), M, N, PCT, value=VALUE, seed=SEED
        ).collect())
    )
    b = sorted(
        map(tuple, add_implicit_ratings(
            _base(spark).repartition(7), M, N, PCT, value=VALUE, seed=SEED
        ).collect())
    )
    assert a == b


def test_weighted_variant_attaches_weight(spark):
    # add_implicit_edges4: implicit observations carry their own weight
    aug = add_implicit_ratings(
        _base(spark), M, N, PCT, value=0.0, weight=0.25, seed=SEED
    )
    assert aug.columns == ["user", "item", "rating", "weight"]
    ws = {r["weight"] for r in aug.collect()}
    assert ws == {1.0, 0.25}  # base rows default 1, implicit rows 0.25


def test_zero_toadd_raises(spark):
    with pytest.raises(ValueError):
        add_implicit_ratings(_base(spark), 10, 10, 1e-9, seed=SEED)


def test_als_runs_on_augmented_ratings(spark):
    aug = add_implicit_ratings(
        _base(spark), M, N, PCT, value=0.5, seed=SEED
    )
    g = ratings_graph(aug, num_partitions=4)
    res = als(g, k=2, lam=0.1, max_iterations=1, with_rmse=False)
    assert res.user_factors.count() > 0
    g.unpersist()
