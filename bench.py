#!/usr/bin/env python
"""Headline benchmark. Prints ONE JSON line:
  {"metric": ..., "value": <sec>, "unit": "sec", "queries": {...}, "sf": ...}

Default run (driver contract): headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the
north-rule flagship — PageRank to convergence (tol 1e-6) on the
deterministic synthetic web-page link graph — reporting
edges-processed/sec = edges x supersteps / wall.

--scaling: run the flagship at local[8] ("N") and local[32] ("4N") in
fresh subprocesses on the SAME input and report throughput at both +
scaling efficiency (BASELINE.md protocol (c); north rule >= 0.8).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# flagship corpus: alpha=1.6/max_out=256 gives mean out-degree ~10, so
# 200k pages ~ 2M edges — enough per-superstep work to measure the
# engine rather than the scheduler.
N_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "200000"))
PAGE_ALPHA = float(os.environ.get("SPARK_GRAFT_BENCH_ALPHA", "1.6"))
PAGE_MAXOUT = int(os.environ.get("SPARK_GRAFT_BENCH_MAXOUT", "256"))
PAGES_CACHE = f"/tmp/pg_bench_pages_{N_PAGES}_{PAGE_ALPHA}_{PAGE_MAXOUT}"


def _ensure_pages(spark):
    """Deterministic pages table, cached across runs (same seed ->
    same table at any parallelism)."""
    from powergraph_spark.webtext import write_pages_table

    marker = os.path.join(PAGES_CACHE, "_SUCCESS")
    if not os.path.exists(marker):
        write_pages_table(spark, PAGES_CACHE, n_pages=N_PAGES, n_sites=256,
                          alpha=PAGE_ALPHA, max_out=PAGE_MAXOUT)
    return spark.read.parquet(PAGES_CACHE)


def flagship_pagerank(spark, tol: float = 1e-6, num_partitions: int | None = None,
                      check_interval: int = 1):
    """pages -> extract -> ingest -> PageRank to convergence.
    Returns (wall_sec, edges, supersteps, checksum)."""
    from pyspark.sql import functions as F

    from powergraph_spark.algorithms import pagerank
    from powergraph_spark.webtext import pages_to_graph

    pages = _ensure_pages(spark)
    t0 = time.time()
    g = pages_to_graph(pages, num_partitions=num_partitions or CPUS,
                       salt_cap=65536)
    n_edges = g.num_edges()
    res = pagerank(g, tol=tol, max_iterations=200,
                   check_interval=check_interval)
    checksum = float(res.state.agg(F.sum("rank")).first()[0])
    wall = time.time() - t0
    g.unpersist()
    return wall, n_edges, res.supersteps, checksum


def run_suite() -> dict:
    from powergraph_spark.session import get_spark

    spark = get_spark(app_name="bench", shuffle_partitions=CPUS)
    import __spark_entry__ as entrymod

    queries: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        fn()
        queries[name] = round(time.time() - t0, 3)

    # north-rule flagship
    wall, n_edges, steps, _ = flagship_pagerank(spark)
    queries["pagerank_webgraph_conv"] = round(wall, 3)
    eps = n_edges * steps / wall if wall > 0 else 0.0

    qs = entrymod.queries()
    for name in [
        "pagerank3", "connected_components", "label_propagation2",
        "triangles_total", "degree_stats",
        "text_stats", "exact_dup_groups", "minhash_candidates",
        "knn_cosine", "simhash",
    ]:
        timed(name, lambda n=name: qs[n](spark, SF_DIR).write.format("noop").mode(
            "overwrite").save())

    total = round(sum(queries.values()), 3)
    sf = 0.1 if "sf0.1" in SF_DIR else (0.01 if "sf0.01" in SF_DIR else 0.001)
    return {
        "metric": "suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "flagship": {
            "n_pages": N_PAGES,
            "edges": n_edges,
            "supersteps": steps,
            "wall_sec": round(wall, 3),
            "edges_per_sec": round(eps, 1),
        },
        "cpus": CPUS,
    }


SCALING_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SCALING_PARTITIONS", "32"))


def run_flagship_once(cpus: int) -> dict:
    """Subprocess entry: one flagship run at a given parallelism.

    The PLAN is held fixed across cluster sizes (shuffle partitions =
    SCALING_PARTITIONS regardless of cores) — exactly how a production
    job scales executors under a fixed partitioning — so the N->4N
    comparison isolates execution parallelism, not plan differences.
    """
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    os.environ["SPARK_GRAFT_MASTER"] = f"local[{cpus}]"
    from powergraph_spark.session import get_spark

    spark = get_spark(app_name=f"bench-scale-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=SCALING_PARTITIONS)
    global CPUS
    CPUS = cpus
    wall, n_edges, steps, checksum = flagship_pagerank(
        spark, num_partitions=SCALING_PARTITIONS, check_interval=5)
    return {
        "cpus": cpus, "wall_sec": round(wall, 3), "edges": n_edges,
        "supersteps": steps,
        "edges_per_sec": round(n_edges * steps / wall, 1),
        "rank_checksum": round(checksum, 6),
    }


def hardware_ceiling() -> dict:
    """Measured max parallel speedup of THIS box (embarrassingly
    parallel CPU burn, no I/O): the upper bound any engine can reach.
    A single-JVM local[k] sandbox shares one memory bus, so 4x threads
    never yields 4x shuffle bandwidth; the north rule's N->4N criterion
    is reported both raw and normalized against this ceiling."""
    code = "x=0\nfor i in range(20_000_000): x+=i"
    out = {}
    for n in (1, 2, 8, 32):
        t0 = time.time()
        ps = [subprocess.Popen([sys.executable, "-c", code]) for _ in range(n)]
        for p in ps:
            p.wait()
        out[n] = time.time() - t0
    return {
        f"effective_cores_at_{n}": round(n * out[1] / out[n], 2)
        for n in (2, 8, 32)
    }


def run_scaling() -> dict:
    """Same flagship job at local[2] / local[8] / local[32] on
    identical input (N->4N twice), plus the measured hardware ceiling."""
    out = {}
    for cpus in (2, 8, 32):
        r = subprocess.run(
            [sys.executable, __file__, "--one", str(cpus)],
            capture_output=True, text=True, timeout=5400,
        )
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
        out[f"local[{cpus}]"] = json.loads(line)
    hw = hardware_ceiling()

    def eff(a, b, factor):
        return round(out[b]["edges_per_sec"] / (factor * out[a]["edges_per_sec"]), 4)

    hw_28 = hw["effective_cores_at_8"] / hw["effective_cores_at_2"]
    hw_832 = hw["effective_cores_at_32"] / hw["effective_cores_at_8"]
    sp_28 = out["local[8]"]["edges_per_sec"] / out["local[2]"]["edges_per_sec"]
    sp_832 = out["local[32]"]["edges_per_sec"] / out["local[8]"]["edges_per_sec"]
    return {
        "metric": "scaling_efficiency_N_to_4N",
        "value": eff("local[2]", "local[8]", 4),
        "unit": "ratio",
        "queries": {k: v["wall_sec"] for k, v in out.items()},
        "sf": N_PAGES,
        "efficiency": {
            "raw_2_to_8": eff("local[2]", "local[8]", 4),
            "raw_8_to_32": eff("local[8]", "local[32]", 4),
            "hw_normalized_2_to_8": round(sp_28 / hw_28, 4),
            "hw_normalized_8_to_32": round(sp_832 / hw_832, 4),
        },
        "hardware_ceiling": hw,
        "detail": out,
        "results_identical": len(
            {v["rank_checksum"] for v in out.values()}
        ) == 1,
    }


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        print(json.dumps(run_flagship_once(int(sys.argv[2]))))
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_suite()))
