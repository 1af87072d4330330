#!/usr/bin/env python
"""Round-6 optimization instrumentation (guide §1). NOT the driver
bench — bench.py is frozen. This file isolates the expensive pieces:

  --flagship   phase breakdown of the flagship (ingest vs loop vs
               per-superstep wall) at the bench corpus size
  --queries    warm noop-sink timing of each bench query (2 runs each,
               so run 2 shows the steady-state cost with the shared
               graph cache hot)
  --plans NAME write .explain("formatted") of a query to stdout

Usage: python bench_extra.py --flagship
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "pagerank3", "connected_components", "label_propagation2",
    "triangles_total", "degree_stats", "text_stats", "exact_dup_groups",
    "minhash_candidates", "knn_cosine", "simhash",
]


def _spark():
    from powergraph_spark.session import get_spark

    return get_spark(app_name="bench_extra", shuffle_partitions=CPUS)


def flagship_breakdown():
    from pyspark.sql import functions as F

    import bench
    from powergraph_spark.algorithms import pagerank
    from powergraph_spark.webtext import pages_to_graph

    spark = _spark()
    pages = bench._ensure_pages(spark)
    out = {}

    t0 = time.time()
    g = pages_to_graph(pages, num_partitions=CPUS, salt_cap=65536)
    n_edges = g.num_edges()
    out["ingest_sec"] = round(time.time() - t0, 3)
    out["edges"] = n_edges

    t0 = time.time()
    res = pagerank(g, tol=1e-6, max_iterations=200, check_interval=1,
                   verbose=True)
    out["loop_sec"] = round(time.time() - t0, 3)
    out["supersteps"] = res.supersteps
    out["superstep_walls"] = [round(m.wall_sec, 3) for m in res.metrics]

    t0 = time.time()
    checksum = float(res.state.agg(F.sum("rank")).first()[0])
    out["checksum_sec"] = round(time.time() - t0, 3)
    out["checksum"] = checksum
    g.unpersist()
    print(json.dumps(out))


def warm_queries():
    spark = _spark()
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out = {}
    for name in BENCH_QUERIES:
        runs = []
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite").save()
            runs.append(round(time.time() - t0, 3))
        out[name] = runs
    print(json.dumps(out))


def rank_digest(cpus: int):
    """Discriminating, order-insensitive per-vertex rank digest
    (ADVICE r5: bench.py's sum(rank) checksum is a mass-conservation
    invariant — equal on ANY corpus — so it cannot evidence
    per-vertex identity across parallelisms). Digest = SUM over
    vertices of the 64-bit integer value of the first 16 hex chars of
    md5(id || ':' || round(rank, 12)), plus the vertex count. One
    vertex differing at >= 1e-12 changes its term and so the sum (up
    to a ~2^-64 md5-prefix collision); a multi-vertex difference
    escapes only if its prefix deltas cancel exactly (~2^-64). Run at
    cpus=2/8/32 on the SAME corpus; equal digests evidence identical
    ranks at 12dp."""
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    os.environ["SPARK_GRAFT_MASTER"] = f"local[{cpus}]"
    from pyspark.sql import functions as F

    from powergraph_spark.session import get_spark

    spark = get_spark(app_name=f"digest-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=int(os.environ.get(
                          "SPARK_GRAFT_SCALING_PARTITIONS", "32")))
    import bench
    bench.CPUS = cpus
    from powergraph_spark.algorithms import pagerank
    from powergraph_spark.webtext import pages_to_graph

    pages = bench._ensure_pages(spark)
    g = pages_to_graph(
        pages,
        num_partitions=int(os.environ.get(
            "SPARK_GRAFT_SCALING_PARTITIONS", "32")),
        salt_cap=65536,
    )
    res = pagerank(g, tol=1e-6, max_iterations=200, check_interval=5)
    row = (
        res.state.select(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("id"),
                                      F.round("rank", 12))), 1, 16
                ), 16, 10,
            ).cast("decimal(38,0)").alias("h")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("h").alias("hsum"),
        )
        .first()
    )
    print(json.dumps({
        "cpus": cpus, "n_vertices": int(row["n"]),
        "digest_sum_md5_16hex": str(row["hsum"]),
        "supersteps": res.supersteps,
    }))


def plan_of(name: str):
    spark = _spark()
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    df = qs[name](spark, SF_DIR)
    print(df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"))


if __name__ == "__main__":
    if "--flagship" in sys.argv:
        flagship_breakdown()
    elif "--queries" in sys.argv:
        warm_queries()
    elif "--digest" in sys.argv:
        rank_digest(int(sys.argv[sys.argv.index("--digest") + 1]))
    elif "--plans" in sys.argv:
        plan_of(sys.argv[sys.argv.index("--plans") + 1])
