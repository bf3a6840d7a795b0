#!/usr/bin/env python3
"""spark-submit driver for the north-rule shipping path.

Usage (the package rides in the zip, not on the driver's PYTHONPATH)::

    make dist
    spark-submit --master local[8] \
        --conf spark.sql.shuffle.partitions=8 \
        --py-files dist/graphblast_spark.zip \
        tools/submit_pr.py --rmat 16 --niter 5

Runs distill-or-generate → Graph.build → PageRank and prints one JSON
line, proving the engine is importable purely from the ``--py-files``
artifact (no repo checkout on the executors).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--rmat", type=int, default=14)
    p.add_argument("--niter", type=int, default=5)
    p.add_argument("--pages", help="pages-schema parquet instead of RMAT")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("graphblast_spark:submit_pr").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # imports resolved from the --py-files zip
    from graphblast_spark import Graph
    from graphblast_spark.algorithms import pagerank

    t0 = time.time()
    if args.pages:
        from graphblast_spark.sources.distill import distill_edges
        from graphblast_spark.sources.pages import read_pages

        edges, _ = distill_edges(read_pages(spark, args.pages))
        g = Graph.build(edges)
    else:
        from graphblast_spark.sources.rmat import rmat_edges, rmat_vertices

        g = Graph.build(
            rmat_edges(spark, scale=args.rmat),
            vertices=rmat_vertices(spark, args.rmat),
        )
    t_build = time.time() - t0

    t0 = time.time()
    pr = pagerank(g, fixed_iters=args.niter)
    top = pr.orderBy(pr["val"].desc()).limit(3).collect()
    t_pr = time.time() - t0

    print(json.dumps({
        "ok": True, "n_vertices": g.n, "n_edges": g.nvals,
        "build_sec": round(t_build, 2), "pr_sec": round(t_pr, 2),
        "top3": [(r["id"], round(r["val"], 8)) for r in top],
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
