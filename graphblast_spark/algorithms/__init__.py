from graphblast_spark.algorithms.pagerank import (
    pagerank,
    pagerank_prep,
    personalized_pagerank,
    spam_mass,
    trustrank,
)
from graphblast_spark.algorithms.bc import betweenness_centrality
from graphblast_spark.algorithms.cc import (
    connected_components,
    incremental_connected_components,
    remap_labels,
)
from graphblast_spark.algorithms.stats import (
    degree_assortativity,
    degree_histogram,
    global_transitivity,
    local_clustering_coefficient,
    reciprocity,
)
from graphblast_spark.algorithms.lp import (
    community_modularity,
    label_propagation_majority,
    label_propagation_min,
    modularity,
)
from graphblast_spark.algorithms.tc import triangle_count, triangle_count_approx
from graphblast_spark.algorithms.bfs import bfs
from graphblast_spark.algorithms.sssp import sssp
from graphblast_spark.algorithms.mis import mis
from graphblast_spark.algorithms.gc import (
    graph_coloring,
    graph_coloring_jp,
    graph_coloring_mis,
    graph_coloring_spec,
)
from graphblast_spark.algorithms.hits import hits
from graphblast_spark.algorithms.katz import eigenvector_centrality, katz_centrality
from graphblast_spark.algorithms.louvain import louvain
from graphblast_spark.algorithms.matching import maximal_matching
from graphblast_spark.algorithms.mst import minimum_spanning_forest
from graphblast_spark.algorithms.salsa import salsa
from graphblast_spark.algorithms.kcore import core_decomposition, k_core
from graphblast_spark.algorithms.ktruss import edge_triangle_support, k_truss, truss_decomposition
from graphblast_spark.algorithms.linkpred import link_prediction_scores
from graphblast_spark.algorithms.lgc import lgc
from graphblast_spark.algorithms.diameter import closeness_centrality, diameter, multi_source_bfs
from graphblast_spark.algorithms.anf import (
    effective_diameter,
    harmonic_centrality_hyperball,
    hyperball,
    neighborhood_function_exact,
)
from graphblast_spark.algorithms.scc import (
    bowtie_decomposition,
    condensation,
    strongly_connected_components,
)
from graphblast_spark.algorithms.walks import neighborhood_sample, node2vec_walks, random_walks

__all__ = [
    "pagerank",
    "pagerank_prep",
    "personalized_pagerank",
    "trustrank",
    "spam_mass",
    "betweenness_centrality",
    "connected_components",
    "strongly_connected_components",
    "bowtie_decomposition",
    "condensation",
    "hyperball",
    "neighborhood_function_exact",
    "effective_diameter",
    "harmonic_centrality_hyperball",
    "community_modularity",
    "incremental_connected_components",
    "remap_labels",
    "degree_assortativity",
    "degree_histogram",
    "local_clustering_coefficient",
    "global_transitivity",
    "reciprocity",
    "label_propagation_majority",
    "label_propagation_min",
    "modularity",
    "triangle_count",
    "triangle_count_approx",
    "bfs",
    "sssp",
    "mis",
    "graph_coloring",
    "graph_coloring_jp",
    "graph_coloring_mis",
    "graph_coloring_spec",
    "hits",
    "salsa",
    "louvain",
    "minimum_spanning_forest",
    "maximal_matching",
    "eigenvector_centrality",
    "katz_centrality",
    "core_decomposition",
    "k_core",
    "k_truss",
    "truss_decomposition",
    "edge_triangle_support",
    "link_prediction_scores",
    "lgc",
    "closeness_centrality",
    "diameter",
    "multi_source_bfs",
    "neighborhood_sample",
    "random_walks",
    "node2vec_walks",
]
