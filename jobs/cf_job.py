"""Cluster entry point: collaborative filtering over a ratings table
— the Spark-submit twin of the reference's CF command-line apps
(toolkits/collaborative_filtering/{als,wals,sgd,biassgd,svdpp,nmf,
sparse_als}.cpp each ship as a binary taking --matrix/--lambda/...;
this one job exposes the same surface behind --algorithm).

Usage:
    spark-submit --py-files powergraph_spark.zip jobs/cf_job.py \
        --ratings <parquet with (user, item, rating[, role[, weight]])> \
        --output <dir> --algorithm als [--k 20] [--lambda 0.01] ...

Writes <output>/user_factors and <output>/item_factors parquet
(+ bias columns for biassgd/svdpp) and prints train RMSE. On a
multi-executor cluster the same invocation scales N -> 4N executors
with no code change (plan partitioning fixed by --partitions).
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ratings", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument(
        "--algorithm", default="als",
        choices=["als", "wals", "sgd", "biassgd", "svdpp", "nmf",
                 "sparse_als"],
    )
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--lambda", dest="lam", type=float, default=None,
                    help="regularization (per-algorithm reference "
                         "default when omitted)")
    ap.add_argument("--gamma", type=float, default=None,
                    help="step size (sgd/biassgd)")
    ap.add_argument("--max-iterations", type=int, default=10)
    ap.add_argument("--tol", type=float, default=1e-3)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--user-col", default="user")
    ap.add_argument("--item-col", default="item")
    ap.add_argument("--rating-col", default="rating")
    ap.add_argument("--role-col", default=None,
                    help="train/validate role column if present")
    ap.add_argument("--weight-col", default=None,
                    help="per-observation weight column (wals)")
    ap.add_argument("--sparsity", type=float, default=0.8,
                    help="sparse_als user/item sparsity")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from powergraph_spark.algorithms import (
        als, als_rmse, biassgd, nmf, ratings_graph, sgd, sparse_als,
        svdpp, wals,
    )

    spark = SparkSession.builder.appName(
        f"powergraph-cf-{args.algorithm}"
    ).getOrCreate()
    ratings = spark.read.parquet(args.ratings)
    g = ratings_graph(
        ratings,
        num_partitions=args.partitions,
        user_col=args.user_col,
        item_col=args.item_col,
        rating_col=args.rating_col,
        role_col=args.role_col,
        weight_col=args.weight_col,
    )

    a = args.algorithm
    common = dict(k=args.k, max_iterations=args.max_iterations,
                  verbose=True)
    if a == "als":
        res = als(g, lam=args.lam if args.lam is not None else 0.01,
                  tolerance=args.tol, **common)
    elif a == "wals":
        res = wals(g, lam=args.lam if args.lam is not None else 0.01,
                   tolerance=args.tol, **common)
    elif a == "sgd":
        res = sgd(g, gamma=args.gamma or 0.01,
                  lam=args.lam if args.lam is not None else 0.065,
                  tolerance=args.tol, **common)
    elif a == "biassgd":
        res = biassgd(g, gamma=args.gamma or 0.001,
                      lam=args.lam if args.lam is not None else 0.001,
                      tolerance=args.tol, **common)
    elif a == "svdpp":
        res = svdpp(g, **common)
    elif a == "nmf":
        res = nmf(g, **common)
    else:  # sparse_als
        res = sparse_als(
            g, lam=args.lam if args.lam is not None else 0.01,
            user_sparsity=args.sparsity, item_sparsity=args.sparsity,
            tolerance=args.tol, **common,
        )

    res.user_factors.write.mode("overwrite").parquet(
        f"{args.output}/user_factors"
    )
    res.item_factors.write.mode("overwrite").parquet(
        f"{args.output}/item_factors"
    )
    if a in ("als", "wals", "sgd", "nmf", "sparse_als"):
        train = (
            ratings.filter(f"{args.role_col} = 'train'")
            if args.role_col else ratings
        )
        print(
            "train_rmse="
            f"{als_rmse(res.user_factors, res.item_factors, train, user_col=args.user_col, item_col=args.item_col, rating_col=args.rating_col):.6f}"
        )
    print(f"algorithm={a} wrote {args.output}/{{user,item}}_factors")


if __name__ == "__main__":
    main()
