"""Smoke test for the spark-submit datapipe job: drive the
session-injectable pipeline body (jobs/datapipe_job.run) end-to-end on
a tiny corpus and check the written documents + report."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "jobs"),
)

import datapipe_job  # noqa: E402


def _args(**kw) -> argparse.Namespace:
    base = dict(
        documents=None, output=None, steps=None, text_col="text",
        id_col="doc_id", min_quality=0.3, langs="en",
        minhash_threshold=0.8, span_k=4, span_max_dup_frac=0.5,
        benchmark=None, decontam_max_overlap=0.1, qsample_seed="qsample",
        split_fractions=None, pack_budget=None, pack_shards=1024,
        partitions=None,
    )
    base.update(kw)
    return argparse.Namespace(**base)


def test_datapipe_job_span_steps(spark, tmp_path):
    src = str(tmp_path / "docs")
    out = str(tmp_path / "out")
    spark.createDataFrame(
        [
            (0, "a b c d e f g h"),   # owner: survives both span steps
            (1, "a b c d x y z w"),   # dup_frac 0.5 -> kept; rewrite trims
            (2, "q r s t u v"),       # unique
            (3, "a b c d e f g h"),   # exact dup: frac 1.0 -> span_filter drops
        ],
        ["doc_id", "text"],
    ).write.mode("overwrite").parquet(src)

    args = _args(documents=src, output=out)
    datapipe_job.run(spark, args, ["span_filter", "span_rewrite"])

    got = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{out}/documents").collect()
    }
    # doc0 and doc3 exceed max_dup_frac=0.5 (frac 1.0) and are dropped;
    # with them gone, doc1's leading 4-gram is no longer duplicated in
    # the SURVIVING corpus, so the rewrite leaves doc1 and doc2 intact.
    assert got == {1: "a b c d x y z w", 2: "q r s t u v"}

    report = {
        r["step"]: (r["docs_in"], r["docs_out"])
        for r in spark.read.parquet(f"{out}/report").collect()
    }
    assert report["span_filter"] == (4, 2)
    assert report["span_rewrite"] == (2, 2)


def test_datapipe_job_filter_dedup_split(spark, tmp_path):
    src = str(tmp_path / "docs2")
    out = str(tmp_path / "out2")
    rows = [(i, "the quick brown fox jumps over the lazy dog "
                f"and keeps running fast mile {i}") for i in range(8)]
    rows += [(100, rows[0][1])]  # exact dup of doc 0
    spark.createDataFrame(rows, ["doc_id", "text"]).write.mode(
        "overwrite"
    ).parquet(src)

    args = _args(documents=src, output=out,
                 split_fractions="train=0.9,val=0.1")
    datapipe_job.run(
        spark, args, ["quality", "langid", "exact_dedup"],
        fractions={"train": 0.9, "val": 0.1},
    )

    docs = spark.read.parquet(f"{out}/documents")
    ids = sorted(r["doc_id"] for r in docs.collect())
    assert ids == list(range(8))  # dup 100 dropped, originals survive
    assert set(docs.columns) >= {"doc_id", "text", "split"}
    assert {r["split"] for r in docs.collect()} <= {"train", "val"}


def test_datapipe_job_qlr_step(spark, tmp_path):
    src = str(tmp_path / "docs3")
    out = str(tmp_path / "out3")
    rows = [(i, "good clean prose sentence article " + f"n{i % 3}", 1)
            for i in range(20)]
    rows += [(100 + i, "spam junk click buy cheap " + f"m{i % 3}", 0)
             for i in range(20)]
    spark.createDataFrame(rows, ["doc_id", "text", "label"]).write.mode(
        "overwrite"
    ).parquet(src)

    args = _args(documents=src, output=out, qlr_label_col="label",
                 qlr_dim=16, qlr_steps=30, qlr_min_prob=0.5)
    datapipe_job.run(spark, args, ["qlr"])

    ids = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{out}/documents").collect()
    )
    assert ids == list(range(20))
