#!/usr/bin/env python3
"""mapInArrow CSR kernel vs join+agg SpMV — the design-decision probe.

Reproduces the BENCH.md "mapInArrow CSR kernel vs join+agg SpMV"
measurement at an arbitrary RMAT scale (default 23, the scale the
headline scaling evidence quotes), pinning the crossover claim at the
size where it matters. Usage::

    SPARK_GRAFT_DRIVER_MEM=48g python tools/bench_kernel.py [scale] [cpus] [reps]

Prints one JSON line; paste the row into BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 23
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import functions as F

    from graphblast_spark import get_spark
    from graphblast_spark.matrix import Graph
    from graphblast_spark.operators import vxm
    from graphblast_spark.operators.kernel import vxm_arrow
    from graphblast_spark.sources.rmat import rmat_edges, rmat_vertices

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus,
                      app_name=f"bench-kernel-s{scale}")
    spark.sparkContext.setLogLevel("ERROR")

    g = Graph.build(rmat_edges(spark, scale=scale),
                    vertices=rmat_vertices(spark, scale),
                    num_partitions=cpus)
    u = g.vertices.select("id", ((F.col("id") % 7) + 1).cast("double").alias("val"))
    u = u.localCheckpoint(eager=True)

    def timed(fn):
        fn()  # warmup rep (reference protocol, gpr.cu:107-148)
        ts = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return sum(ts) / len(ts)

    t_join = timed(lambda: vxm(u, g, "PlusMultiplies").count())
    t_kernel = timed(lambda: vxm_arrow(u, g, "PlusMultiplies").count())

    print(json.dumps({
        "graph": f"rmat_s{scale}",
        "edges": g.nvals,
        "cpus": cpus,
        "reps": reps,
        "join_sec_per_op": round(t_join, 2),
        "kernel_sec_per_op": round(t_kernel, 2),
        "join_edges_per_sec": round(g.nvals / t_join, 1),
        "kernel_edges_per_sec": round(g.nvals / t_kernel, 1),
        "join_speedup": round(t_kernel / t_join, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
