from .extract import EXTRACTED_SCHEMA, extract_pages
from .graph import edges_expr, graph_structure, nodes_expr
from .analyze import analyze_pages, explain_routing, route_expr, should_enrich_expr
from .multimodal import media_features

__all__ = [
    "extract_pages",
    "EXTRACTED_SCHEMA",
    "graph_structure",
    "nodes_expr",
    "edges_expr",
    "analyze_pages",
    "explain_routing",
    "route_expr",
    "should_enrich_expr",
    "media_features",
]
