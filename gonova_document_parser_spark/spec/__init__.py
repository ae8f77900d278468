"""Deterministic extraction spec — pure Python, zero Spark imports.

This package is simultaneously the *oracle* (run the functions directly,
single-threaded) and the *engine* (the same functions run inside Arrow-batched
Spark UDFs, see ``gonova_document_parser_spark.operators.extract``).  Because
both paths execute byte-for-byte the same code on the same bytes, the
"extracted text byte-identical per url" contract holds by construction and is
regression-pinned by the pytest fixtures in ``tests/``.

Semantics grafted from the reference (``/root/reference``, see SURVEY.md):
  - classify -> route -> per-unit extract -> ordered merge
    (``async_processor.py:63-140``, the legacy per-page-routed pipeline).
  - page-merge format ``<!-- Page {n} -->\\n\\n{content}`` joined with
    ``\\n\\n---\\n\\n`` (``async_processor.py:273-293``,
    ``mineru_processor.py:333-348``).
  - error-marker format ``[Error processing page {n}: {msg}]``
    (``mineru_processor.py:255-258``).
  - "scanned" threshold: extractable text layer < 50 chars
    (``page_classifier.py:94-106``).
"""

from .classify import classify_page_type, pdf_text_layer_len
from .htmlx import extract_html_blocks
from .pdfx import extract_pdf_pages
from .api import (
    PAGE_SEPARATOR,
    extract_document,
    error_marker,
    fake_scanned_extract,
    merge_pages,
    page_marker,
    strict_scanned_extract,
)

__all__ = [
    "fake_scanned_extract",
    "strict_scanned_extract",
    "classify_page_type",
    "pdf_text_layer_len",
    "extract_html_blocks",
    "extract_pdf_pages",
    "extract_document",
    "merge_pages",
    "page_marker",
    "error_marker",
    "PAGE_SEPARATOR",
]
