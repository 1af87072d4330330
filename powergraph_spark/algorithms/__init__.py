from .connected_components import component_sizes, connected_components
from .label_propagation import label_histogram, label_propagation
from .pagerank import pagerank, total_rank
from .triangle_count import triangle_count, triangle_edge_counts

__all__ = [
    "pagerank",
    "total_rank",
    "connected_components",
    "component_sizes",
    "label_propagation",
    "label_histogram",
    "triangle_count",
    "triangle_edge_counts",
]
