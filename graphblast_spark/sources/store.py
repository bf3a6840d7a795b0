"""Durable bucketed graph store — build once, reload shuffle-free.

The reference caches the parsed+built CSR as a binary ``.dat`` beside
the input (reference graphblas/backend/cuda/sparse_matrix.hpp:328-345
readBinary/writeBinary via util.hpp:331-357): later runs load it and
skip the parse+build entirely. The Spark-native analog must preserve
the *physical layout* across jobs, not just the bytes — a plain parquet
round-trip forgets the hash(src) clustering, so the first superstep
join of every later job re-shuffles all |E| rows.

Hive-style bucketed tables are Spark's mechanism for recording
clustering in the catalog: ``bucketBy(n, "src").sortBy("src", "dst")``
writes each hash(src) bucket as its own file set, and a later join or
aggregation keyed on ``src`` scans it with NO exchange on the edge side
(Catalyst sees HashPartitioning(src, n) on the scan and drops the
Exchange; only the small vector side shuffles). ``sortBy`` restores the
within-partition (src, dst) order ``Graph.build`` establishes.

At 100 TB this is the difference between paying the |E| build shuffle
once per corpus version and paying it once per job: every downstream
run (PageRank, CC, TC, ad-hoc SpMV) starts from the bucketed table.
Size ``buckets`` to the fleet's shuffle parallelism — Spark can
coalesce mismatched bucket counts in joins, but matching them keeps
every superstep exchange-free on the edge side.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from graphblast_spark.matrix import Graph


def _table_names(name: str) -> tuple[str, str, str]:
    return f"{name}_edges", f"{name}_vertices", f"{name}_meta"


def save_graph(
    g: Graph,
    name: str,
    path: str | None = None,
    buckets: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a built Graph as bucketed catalog tables.

    ``name`` prefixes three tables: ``{name}_edges`` (bucketed+sorted by
    src), ``{name}_vertices`` (bucketed by id) and ``{name}_meta`` (one
    row: n, nvals, buckets). ``path`` roots the parquet files outside
    the warehouse dir (external tables); omitted → managed tables.
    """
    spark = g.edges.sparkSession
    if buckets is None:
        buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    t_edges, t_verts, t_meta = _table_names(name)

    w = (
        g.edges.write.format("parquet").mode(mode)
        .bucketBy(buckets, "src").sortBy("src", "dst")
    )
    if path:
        w = w.option("path", f"{path}/edges")
    w.saveAsTable(t_edges)

    wv = g.vertices.write.format("parquet").mode(mode).bucketBy(buckets, "id")
    if path:
        wv = wv.option("path", f"{path}/vertices")
    wv.saveAsTable(t_verts)

    meta = spark.createDataFrame(
        [(int(g.n), int(g.nvals), int(buckets))], "n long, nvals long, buckets int"
    )
    wm = meta.write.format("parquet").mode(mode)
    if path:
        wm = wm.option("path", f"{path}/meta")
    wm.saveAsTable(t_meta)


def load_graph(spark: SparkSession, name: str) -> Graph:
    """Reload a :func:`save_graph` graph without re-cleaning or
    re-shuffling — the bucket spec on the scan IS the layout, so the
    returned Graph behaves exactly like a freshly built one (n/nvals
    come from the meta table; no count jobs run)."""
    t_edges, t_verts, t_meta = _table_names(name)
    meta = spark.table(t_meta).first()
    return Graph(
        edges=spark.table(t_edges),
        vertices=spark.table(t_verts),
        n=int(meta["n"]),
        nvals=int(meta["nvals"]),
    )


def drop_graph(spark: SparkSession, name: str) -> None:
    """Drop the three catalog tables (files too, for managed tables)."""
    for t in _table_names(name):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
