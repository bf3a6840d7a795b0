"""Deterministic graphs derived from the driver's TPC-H-ish tables.

The driver's correctness gate compares Spark results against DuckDB SQL
over the same parquet views, so the *test* graphs must be derivable in
both engines from identical expressions. Two graphs:

- **co-purchase** (undirected, triangles, hubs): parts that co-occur in
  an order: ``SELECT DISTINCT a.l_partkey, b.l_partkey FROM lineitem a
  JOIN lineitem b ON same order AND different part``. Symmetric by
  construction; popular parts are hub vertices (skew).
- **part→supplier bipartite** (directed, dangling): l_partkey →
  l_suppkey + SUPP_OFFSET. Suppliers have no out-edges — exercises
  PageRank's no-dangling-redistribution semantics (SURVEY §7.3.5).

The production ingestion path is sources/distill.py (pages → edges);
these exist so every engine op has a DuckDB-checkable oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphblast_spark.matrix import Graph

SUPP_OFFSET = 1_000_000

# Shared SQL fragments (DuckDB oracle side) — keep in lockstep with the
# DataFrame builders below.
SQL_COPURCHASE_EDGES = """
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
"""
SQL_COPURCHASE_VERTICES = "SELECT DISTINCT l_partkey AS id FROM lineitem"

SQL_PARTSUPP_EDGES = f"""
  SELECT DISTINCT l_partkey AS src, l_suppkey + {SUPP_OFFSET} AS dst
  FROM lineitem
"""
SQL_PARTSUPP_VERTICES = f"""
  SELECT DISTINCT l_partkey AS id FROM lineitem
  UNION
  SELECT DISTINCT l_suppkey + {SUPP_OFFSET} AS id FROM lineitem
"""


def _lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _lineitem(spark, sf_dir).select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    return (
        a.join(b, "ok")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .withColumn("val", F.lit(1.0))
    )


def copurchase_graph(spark: SparkSession, sf_dir: str) -> Graph:
    li = _lineitem(spark, sf_dir)
    vertices = li.select(F.col("l_partkey").alias("id")).distinct()
    # feed the RAW join pairs (no pre-distinct): Graph.build dedups
    # after its repartition-by-src, so the whole build is one shuffle —
    # a separate distinct() here would add a full extra exchange of the
    # pair stream for nothing (copurchase_edges keeps it because the
    # g_build contract output must match the DISTINCT oracle SQL as-is)
    a = _lineitem(spark, sf_dir).select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src")
    )
    b = _lineitem(spark, sf_dir).select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst")
    )
    pairs = (
        a.join(b, "ok")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .withColumn("val", F.lit(1.0))
    )
    return Graph.build(pairs, vertices=vertices)


def partsupp_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _lineitem(spark, sf_dir)
    return (
        li.select(
            F.col("l_partkey").alias("src"),
            (F.col("l_suppkey") + F.lit(SUPP_OFFSET)).alias("dst"),
        )
        .distinct()
        .withColumn("val", F.lit(1.0))
    )


def partsupp_graph(spark: SparkSession, sf_dir: str) -> Graph:
    li = _lineitem(spark, sf_dir)
    vertices = (
        li.select(F.col("l_partkey").alias("id"))
        .unionByName(li.select((F.col("l_suppkey") + F.lit(SUPP_OFFSET)).alias("id")))
        .distinct()
    )
    return Graph.build(partsupp_edges(spark, sf_dir), vertices=vertices)


# --- order-sequence graph: directed with non-trivial SCC structure ------
#
# part(linenumber i) → part(linenumber i+1) within an order, sparsified
# by a deterministic hash filter (mod 6 keeps ~1/6 of the sequence
# pairs). Unlike copurchase (symmetric ⇒ SCC = CC) and partsupp
# (bipartite DAG ⇒ all SCCs singletons) this graph has the bowtie-ish
# shape real web graphs show — at sf0.01: 1 980 vertices, ~4.9k edges,
# 444 SCCs with a 526-vertex core — so it exercises strongly-connected-
# component extraction for real. The mod-6 filter is part of the graph
# DEFINITION (both engines build the identical edge set).

SQL_ORDSEQ_EDGES = """
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey
   AND b.l_linenumber = a.l_linenumber + 1
   AND a.l_partkey <> b.l_partkey
  WHERE (a.l_partkey * 31 + b.l_partkey) % 6 = 0
"""
SQL_ORDSEQ_VERTICES = f"""
  SELECT src AS id FROM ({SQL_ORDSEQ_EDGES})
  UNION
  SELECT dst FROM ({SQL_ORDSEQ_EDGES})
"""


def ordseq_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _lineitem(spark, sf_dir).select("l_orderkey", "l_linenumber", "l_partkey")
    a = li.select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        F.col("l_partkey").alias("src"),
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"),
        (F.col("l_linenumber") - 1).alias("ln"),
        F.col("l_partkey").alias("dst"),
    )
    return (
        a.join(b, ["ok", "ln"])
        .filter(F.col("src") != F.col("dst"))
        .filter((F.col("src") * 31 + F.col("dst")) % 6 == 0)
        .select("src", "dst")
        .distinct()
        .withColumn("val", F.lit(1.0))
    )


def ordseq_graph(spark: SparkSession, sf_dir: str) -> Graph:
    e = ordseq_edges(spark, sf_dir)
    vertices = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    return Graph.build(e, vertices=vertices)
