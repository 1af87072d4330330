"""Cluster entry point: graph analytics over an edge list — the
spark-submit twin of the reference's graph_analytics binaries
(toolkits/graph_analytics/{connected_component,sssp,kcore,
undirected_triangle_count,simple_coloring,approximate_diameter,
pagerank}.cpp each ship as a CLI over an edge file; this one job
exposes them behind --algorithm over any (src, dst) parquet or the
repo's text formats via powergraph_spark.io.load).

Usage:
    spark-submit --py-files powergraph_spark.zip jobs/graph_job.py \
        --edges <parquet with (src, dst)> --output <dir> \
        --algorithm cc [--partitions 4096] ...
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", required=True,
                    help="parquet with (src, dst) columns")
    ap.add_argument("--output", required=True)
    ap.add_argument(
        "--algorithm", default="cc",
        choices=["pagerank", "cc", "sssp", "triangles", "kcore",
                 "coloring", "diameter", "labelprop", "gibbs", "scc",
                 "walks", "ddmap", "mplp"],
    )
    ap.add_argument(
        "--dd-variant", default="symmetric",
        choices=["symmetric", "projected", "admm", "bethe"],
        help="ddmap solver program (the reference binary's "
             "`algorithm 0/1/2/3` positional)",
    )
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-iterations", type=int, default=200)
    ap.add_argument("--source", type=int, default=0,
                    help="sssp source vertex")
    ap.add_argument("--kcore-k", type=int, default=3)
    ap.add_argument("--gibbs-states", type=int, default=2,
                    help="MRF states (gibbs and ddmap)")
    ap.add_argument("--gibbs-beta", type=float, default=1.0)
    ap.add_argument("--gibbs-sweeps", type=int, default=3)
    ap.add_argument("--seed", default="gibbs")
    ap.add_argument("--dd-step", type=float, default=1.0)
    ap.add_argument("--potentials", default=None,
                    help="parquet with (id, potential array<double>) "
                         "log priors for ddmap; defaults to zeros")
    ap.add_argument("--walk-length", type=int, default=10)
    ap.add_argument("--walks-per-vertex", type=int, default=1)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from powergraph_spark.algorithms import (
        approx_diameter,
        chromatic_gibbs,
        coloring,
        dual_decomposition_map,
        connected_components,
        kcore_vertices,
        label_propagation,
        pagerank,
        random_walks,
        scc,
        sssp,
        triangle_count,
    )
    from powergraph_spark.graph import Graph

    spark = SparkSession.builder.appName(
        f"powergraph-{args.algorithm}"
    ).getOrCreate()
    g = Graph.from_edges(
        spark.read.parquet(args.edges).select("src", "dst"),
        num_partitions=args.partitions,
    )

    a = args.algorithm
    if a == "pagerank":
        out = pagerank(g, tol=args.tol,
                       max_iterations=args.max_iterations,
                       verbose=True).state.select("id", "rank")
    elif a == "cc":
        out = connected_components(g).state.select("id", "component")
    elif a == "sssp":
        out = sssp(g, source=args.source).state.select("id", "dist")
    elif a == "triangles":
        out, total = triangle_count(g)
        print(f"total_triangles={total}")
    elif a == "kcore":
        out = kcore_vertices(g, k=args.kcore_k)
    elif a == "coloring":
        out = coloring(g)
    elif a == "diameter":
        hops, _history = approx_diameter(g)
        out = spark.createDataFrame([(int(hops),)], "diameter long")
    elif a == "scc":
        out = scc(g).state
    elif a == "walks":
        out = random_walks(
            g, walks_per_vertex=args.walks_per_vertex,
            length=args.walk_length, seed=args.seed,
        ).walks
    elif a in ("ddmap", "mplp"):
        from pyspark.sql import functions as F

        from powergraph_spark.algorithms import (
            dd_map_admm,
            dd_map_bethe,
            dd_map_projected,
            mplp_map,
        )
        if args.potentials:
            pots = spark.read.parquet(args.potentials)
        else:
            k = args.gibbs_states
            pots = g.vertices.select(
                "id",
                F.expr(f"array_repeat(CAST(0.0 AS DOUBLE), {k})")
                .alias("potential"),
            )
        solver = mplp_map if a == "mplp" else {
            "symmetric": dual_decomposition_map,
            "projected": dd_map_projected,
            "admm": dd_map_admm,
            "bethe": dd_map_bethe,
        }[args.dd_variant]
        kw = {} if a == "mplp" else {"step_size": args.dd_step}
        res = solver(
            g, pots, num_states=args.gibbs_states,
            max_iterations=args.max_iterations, verbose=True, **kw,
        )
        print(f"{a} dual={res.dual} primal={res.primal} "
              f"agreement={res.agreement}")
        out = res.assignments.select("id", "label")
    elif a == "gibbs":
        # Potts/Ising sample: proper coloring first (chromatic
        # schedule), then determinized class-parallel sweeps
        out = chromatic_gibbs(
            g, coloring(g),
            n_states=args.gibbs_states, beta=args.gibbs_beta,
            sweeps=args.gibbs_sweeps, seed=args.seed,
        ).state
    else:  # labelprop
        out = label_propagation(
            g, max_iterations=args.max_iterations
        ).state.select("id", "label")

    out.write.mode("overwrite").parquet(args.output)
    print(f"algorithm={a} wrote {args.output} rows={out.count()}")


if __name__ == "__main__":
    main()
