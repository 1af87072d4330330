from .extract import (anchor_pairs, anchor_texts, extract_pages,
                      link_pairs, links_expr, text_expr)
from .ingest import audit_collisions, pages_to_graph, url_id
from .pages import expected_edges, generate_pages, write_pages_table
from .urls import canonicalize_url, host_graph, host_of, latest_capture

__all__ = [
    "extract_pages",
    "anchor_pairs",
    "anchor_texts",
    "link_pairs",
    "links_expr",
    "text_expr",
    "pages_to_graph",
    "audit_collisions",
    "url_id",
    "generate_pages",
    "write_pages_table",
    "expected_edges",
    "canonicalize_url",
    "host_of", "latest_capture",
    "host_graph",
]
