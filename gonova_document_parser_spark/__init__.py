"""gonova_document_parser_spark — PySpark-native web-document extraction engine.

A brand-new, Spark-first rebuild (not a port) of the extraction capabilities
of ``websines/gonova-document-parser``: classify -> route -> extract ->
ordered merge over a Common-Crawl-style pages table, as stage-fused
Arrow-vectorized UDFs with explicit skew handling and per-partition
checkpoint/lineage/metrics.  See SURVEY.md for the full reference analysis.
"""

from .corpus import generate_pages, make_page
from .operators.extract import EXTRACTED_SCHEMA, extract_pages
from .session import get_spark
from .spec import extract_document

__all__ = [
    "extract_pages",
    "extract_document",
    "EXTRACTED_SCHEMA",
    "generate_pages",
    "make_page",
    "get_spark",
]
