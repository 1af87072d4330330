"""Smoke test for the spark-submit datapipe job: drive the
session-injectable pipeline body (jobs/datapipe_job.run) end-to-end on
a tiny corpus and check the written documents + report."""

from __future__ import annotations

import argparse
import os
import sys

import pytest

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
        ppl_cutoffs=None, ppl_keep="head,middle",
        dsir_target=None, dsir_n=100000, dsir_dim=64,
        strat_col=None, strat_n=10000,
        embeddings=None, semdedup_k=1024, semdedup_threshold=0.95,
        bpe_merges=None,
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


def test_datapipe_job_selection_steps(spark, tmp_path):
    """Round-5 selection steps: strat + ppl + bpe-merges output."""
    src = str(tmp_path / "docs2")
    out = str(tmp_path / "out2")
    rows = [
        (i, f"the cat sat on mat {i} " + ("en" if i % 2 else "fr"),
         "en" if i % 2 else "fr")
        for i in range(40)
    ]
    spark.createDataFrame(rows, ["doc_id", "text", "lang"]).write.mode(
        "overwrite"
    ).parquet(src)

    args = _args(documents=src, output=out, strat_col="lang", strat_n=5,
                 ppl_cutoffs="-1000.0,-1000.0", ppl_keep="head",
                 bpe_merges=4)
    datapipe_job.run(spark, args, ["strat", "ppl"])

    docs = spark.read.parquet(f"{out}/documents").collect()
    # 5 per lang survive strat; every doc scores >= -1000 -> head
    assert len(docs) == 10
    by = {}
    for r in docs:
        by.setdefault(r["lang"], 0)
        by[r["lang"]] += 1
    assert by == {"en": 5, "fr": 5}
    merges = spark.read.parquet(f"{out}/bpe_merges").collect()
    assert len(merges) == 4 and all(m["freq"] >= 2 for m in merges)


def test_datapipe_job_semdedup_dsir_steps(spark, tmp_path):
    src = str(tmp_path / "docs3")
    out = str(tmp_path / "out3")
    embp = str(tmp_path / "emb3")
    tgt = str(tmp_path / "tgt3")
    rows = [
        (i, f"alpha beta gamma {i}" if i % 2 else f"un deux trois {i}")
        for i in range(20)
    ]
    spark.createDataFrame(rows, ["doc_id", "text"]).write.mode(
        "overwrite"
    ).parquet(src)
    # embeddings: ids 0..9 share one vector (exact dups -> one
    # survivor), 10..19 are mutually ORTHOGONAL basis vectors (no
    # pair is a near-dup)
    emb_rows = []
    for i in range(20):
        if i < 10:
            v = [1.0] * 12
        else:
            v = [0.0] * 12
            v[i - 10] = 1.0
        emb_rows.append((i, v))
    spark.createDataFrame(emb_rows, ["vec_id", "embedding"]).write.mode(
        "overwrite"
    ).parquet(embp)
    # dsir target: the "alpha beta gamma" domain
    spark.createDataFrame(
        [(100 + i, f"alpha beta gamma {i}") for i in range(5)],
        ["doc_id", "text"],
    ).write.mode("overwrite").parquet(tgt)

    args = _args(documents=src, output=out, embeddings=embp,
                 semdedup_k=2, semdedup_threshold=0.99,
                 dsir_target=tgt, dsir_n=4, dsir_dim=32)
    datapipe_job.run(spark, args, ["semdedup", "dsir"])

    docs = spark.read.parquet(f"{out}/documents").collect()
    assert len(docs) == 4
    # ids 1..9 are exact embedding dups of id 0 -> only one of the
    # first ten can survive semdedup; dsir then prefers the alpha
    # domain among survivors
    ids = {r["doc_id"] for r in docs}
    assert len(ids & set(range(10))) <= 1
    texts = [r["text"] for r in docs]
    assert sum(t.startswith("alpha") for t in texts) >= 2


def test_spark_submit_pyfiles_pagerank(spark, tmp_path):
    """North-rule launch shape, end to end as a REAL subprocess:
    build powergraph_spark.zip, `spark-submit --py-files <zip>
    jobs/pagerank_job.py` on a tiny deterministic pages table, and
    assert the written ranks are byte-identical to the in-session
    engine at a different parallelism (the same cross-parallelism
    invariant the scaling campaign certifies; reference launch:
    toolkits/graph_analytics/pagerank.cpp:170-274 via mpiexec)."""
    import shutil
    import subprocess

    submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not os.path.exists(submit):
        pytest.skip("spark-submit not on PATH")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pages_path = str(tmp_path / "pages")
    out_path = str(tmp_path / "ranks")
    zip_path = str(tmp_path / "powergraph_spark.zip")

    from powergraph_spark.webtext import pages_to_graph, write_pages_table

    write_pages_table(spark, pages_path, n_pages=400)

    subprocess.run(
        [sys.executable, "-m", "zipfile", "-c", zip_path, "powergraph_spark"],
        cwd=repo, check=True,
    )

    # Scrub PYTHONPATH so the driver can only import the package from
    # the --py-files zip (neutral cwd for the same reason).
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [
            submit, "--master", "local[2]", "--driver-memory", "2g",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(repo, "jobs", "pagerank_job.py"),
            "--pages", pages_path, "--output", out_path,
            "--tol", "1e-3", "--max-iterations", "15", "--partitions", "4",
        ],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "termination=" in proc.stdout

    got = {
        r["id"]: r["rank"]
        for r in spark.read.parquet(out_path).collect()
    }
    g = pages_to_graph(spark.read.parquet(pages_path), num_partitions=4)
    from powergraph_spark.algorithms import pagerank

    res = pagerank(g, tol=1e-3, max_iterations=15)
    want = {r["id"]: r["rank"] for r in res.state.select("id", "rank").collect()}
    assert set(got) == set(want)
    assert got == want  # byte-identical across parallelism levels
