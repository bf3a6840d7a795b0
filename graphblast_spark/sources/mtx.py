"""MatrixMarket ingestion + fixture loading.

The reference reads graphs with readMtx/readTuples (util.hpp:363-430,
mmio.hpp): 1-based → 0-based shift, `pattern` banner ⇒ val = 1.0,
`symmetric` banner or --directed 2 ⇒ mirror every edge. This is the
parity-test entry; production ingestion is sources/distill.py (pages →
edges), the analog of the reference's binary parse cache.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from graphblast_spark.matrix import EDGE_SCHEMA, Graph
from graphblast_spark.sources.fixtures import FIXTURES


def read_mtx(path: str) -> tuple[int, bool, list[tuple[int, int, float]]]:
    """Tiny MatrixMarket coordinate reader (CPU-side, fixtures only).
    Returns (n, symmetric_banner, edges-as-0-based-triples)."""
    with open(path) as fh:
        banner = fh.readline().strip().lower()
        if not banner.startswith("%%matrixmarket matrix coordinate"):
            raise ValueError(f"unsupported MatrixMarket banner: {banner}")
        symmetric = "symmetric" in banner
        pattern = "pattern" in banner
        line = fh.readline()
        while line.startswith("%"):
            line = fh.readline()
        nrows, _ncols, _nnz = map(int, line.split()[:3])
        edges = []
        for line in fh:
            parts = line.split()
            if not parts:
                continue
            r, c = int(parts[0]) - 1, int(parts[1]) - 1
            v = 1.0 if pattern or len(parts) < 3 else float(parts[2])
            edges.append((r, c, v))
    return nrows, symmetric, edges


def _to_graph(
    spark: SparkSession,
    n: int,
    symmetric: bool,
    edges: list[tuple[int, int, float]],
    directed: int = 1,
    num_partitions: int | None = None,
) -> Graph:
    """directed=2 forces symmetrization like the reference CLI flag
    (run_cc.sh:16, run_tc.sh:17); a symmetric banner always mirrors."""
    edf = spark.createDataFrame(edges, EDGE_SCHEMA)
    vdf = spark.range(n).selectExpr("id")
    return Graph.build(
        edf,
        vertices=vdf,
        symmetrize=symmetric or directed == 2,
        num_partitions=num_partitions,
    )


def fixture_graph(
    spark: SparkSession, name: str, directed: int = 1, num_partitions: int | None = 8
) -> Graph:
    """Load a transliterated reference fixture as a Graph."""
    fx = FIXTURES[name]
    return _to_graph(spark, fx["n"], fx["symmetric"], fx["edges"], directed, num_partitions)


def mtx_graph(spark: SparkSession, path: str, directed: int = 1) -> Graph:
    n, symmetric, edges = read_mtx(path)
    return _to_graph(spark, n, symmetric, edges, directed)


def write_mtx(g: Graph, path: str, pattern: bool = False) -> None:
    """Single-file MatrixMarket export — the interchange artifact the
    reference's own tooling consumes (mmio.hpp reads what this writes;
    round-trips through :func:`read_mtx`/:func:`mtx_graph` exactly).
    1-based coordinates, (row, col)-sorted like customSort;
    ``pattern=True`` drops values and writes a pattern banner.

    Driver-streamed via ``toLocalIterator`` (one partition in memory at
    a time) because a .mtx is by definition a single local text file —
    this is the hand-off to single-node tooling, NOT a cluster sink;
    at scale use ``sources.store.save_graph`` (bucketed parquet)."""
    kind = "pattern" if pattern else "real"
    with open(path, "w") as fh:
        fh.write(f"%%MatrixMarket matrix coordinate {kind} general\n")
        fh.write(f"{g.n} {g.n} {g.nvals}\n")
        for r in g.edges.orderBy("src", "dst").toLocalIterator():
            if pattern:
                fh.write(f"{r.src + 1} {r.dst + 1}\n")
            else:
                fh.write(f"{r.src + 1} {r.dst + 1} {r.val:.17g}\n")
