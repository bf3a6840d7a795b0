from graphblast_spark.algorithms.pagerank import pagerank
from graphblast_spark.algorithms.cc import connected_components
from graphblast_spark.algorithms.lp import label_propagation_majority, label_propagation_min
from graphblast_spark.algorithms.tc import triangle_count
from graphblast_spark.algorithms.bfs import bfs
from graphblast_spark.algorithms.sssp import sssp

__all__ = [
    "pagerank",
    "connected_components",
    "label_propagation_majority",
    "label_propagation_min",
    "triangle_count",
    "bfs",
    "sssp",
]
