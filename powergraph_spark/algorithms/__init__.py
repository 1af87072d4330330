from .als import ALSResult, add_implicit_ratings, als, predict as als_predict, ratings_graph, recommend_topk, recommend_topk_ann, rmse as als_rmse, sgd
from .adpredictor import (
    AdPredictorResult,
    adpredictor,
    adpredictor_graph,
)
from .approx_diameter import approx_diameter
from .biassgd import BiasSGDResult, biassgd, biassgd_predict
from .cascades import cascades, seed_status, sir_counts
from .centrality import betweenness, closeness, harmonic, multi_source_bfs, prestige
from .coloring import coloring, count_colors, count_conflicts
from .connected_components import component_sizes, connected_components
from .directed_triangles import (
    directed_triangle_counts,
    directed_triangle_totals,
)
from .eigen import normalize_eigenvector, top_eigenvector
from .embeddings import (
    EmbeddingResult,
    node_embeddings,
    sppmi,
    walk_cooccurrence,
)
from .laplacian import graph_laplacian, write_spectral_inputs
from .admm import ADMMResult, dd_map_admm, dd_map_bethe, solve_qp_dense
from .dd import DDResult, dd_map_projected, dual_decomposition_map
from .lbp import LBPResult, belief_probabilities, lbp
from .lda import LDAResult, doc_word_tokens, lda, top_words
from .gibbs import GibbsResult, chromatic_gibbs
from .scc import SCCResult, scc
from .walks import WalkResult, random_walks
from .jacobi import JacobiResult, jacobi
from .hits import hits
from .kmeans import KMeansResult, cluster_sizes, kmeans
from .kcore import coreness, kcore_stats, kcore_vertices
from .ktruss import ktruss
from .label_propagation import label_histogram, label_propagation
from .mplp import MPLPResult, mplp_map
from .nmf import nmf
from .pagerank import (
    pagerank,
    pagerank_delta,
    pagerank_warm_start,
    pagerank_weighted,
    personalized_pagerank,
    total_rank,
)
from .sparse_als import cosamp, sparse_als
from .spectral import (
    SpectralResult,
    normalized_adjacency,
    spectral_clustering,
    spectral_embedding,
)
from .svd import SVDResult, svd
from .svdpp import SVDPPResult, svdpp, svdpp_predict
from .wals import wals
from .sssp import dijkstra_tree, sssp
from .triangle_count import (
    triangle_count,
    triangle_edge_counts,
    triangle_total,
)

__all__ = [
    "EmbeddingResult",
    "node_embeddings",
    "sppmi",
    "walk_cooccurrence",
    "ALSResult",
    "als",
    "als_predict",
    "als_rmse",
    "ratings_graph",
    "KMeansResult",
    "kmeans",
    "cluster_sizes",
    "recommend_topk",
    "recommend_topk_ann",
    "sgd",
    "svd",
    "SVDResult",
    "pagerank",
    "pagerank_delta",
    "pagerank_warm_start",
    "total_rank",
    "connected_components",
    "component_sizes",
    "label_propagation",
    "label_histogram",
    "triangle_count",
    "triangle_edge_counts",
    "triangle_total",
    "sssp",
    "kcore_vertices",
    "kcore_stats",
    "coreness",
    "approx_diameter",
    "coloring",
    "count_colors",
    "count_conflicts",
    "top_eigenvector",
    "normalize_eigenvector",
    "graph_laplacian",
    "write_spectral_inputs",
    "LBPResult",
    "lbp",
    "DDResult",
    "dual_decomposition_map",
    "dd_map_projected",
    "ADMMResult",
    "dd_map_admm",
    "dd_map_bethe",
    "solve_qp_dense",
    "MPLPResult",
    "mplp_map",
    "belief_probabilities",
    "LDAResult",
    "lda",
    "doc_word_tokens",
    "top_words",
    "nmf",
    "SVDPPResult",
    "svdpp",
    "svdpp_predict",
    "wals",
    "JacobiResult",
    "jacobi",
    "chromatic_gibbs",
    "GibbsResult",
    "random_walks",
    "WalkResult",
    "scc",
    "SCCResult",
    "BiasSGDResult",
    "biassgd",
    "biassgd_predict",
    "AdPredictorResult",
    "adpredictor",
    "adpredictor_graph",
    "sparse_als",
    "cosamp",
    "SpectralResult",
    "spectral_clustering",
    "spectral_embedding",
    "normalized_adjacency",
    "multi_source_bfs",
    "closeness",
    "harmonic",
    "prestige",
    "dijkstra_tree",
    "betweenness",
    "directed_triangle_counts",
    "directed_triangle_totals",
    "cascades",
    "seed_status",
    "sir_counts",
    "add_implicit_ratings",
    "pagerank_weighted",
    "personalized_pagerank",
    "hits",
    "ktruss",
]
