"""Page-type classifier: html | pdf | scanned (pure Python, no Spark).

Grafts the reference's per-page heuristics
(``/root/reference/document_parser/page_classifier.py:35-112``) to a web
corpus: magic-byte sniffing replaces filename keywords, and the <50-char
extractable-text rule (``page_classifier.py:94-106``) decides pdf vs scanned.
Cheap probes run before any full parse, mirroring the reference's
route-before-work strategy (``document_analyzer.py:22-113``).
"""

from __future__ import annotations

import re

from .pdfx import pdf_text_len

# Reference threshold: "Very little text = might be scanned"
# (page_classifier.py:100: ``if text_length < 50``).
MIN_TEXT_LAYER_CHARS = 50

_HTML_SNIFF = re.compile(rb"<[a-zA-Z][a-zA-Z0-9:-]*[\s/>]")


def pdf_text_layer_len(data: bytes) -> int:
    return pdf_text_len(data)


def classify_page_type(data: bytes) -> str:
    """Classify raw page bytes as 'html' | 'pdf' | 'scanned'.

    - ``%PDF-`` magic + extractable text layer >= 50 chars  -> 'pdf'
    - ``%PDF-`` magic + text layer < 50 chars (image-only)  -> 'scanned'
    - markup sniffed in the head                            -> 'html'
    - anything else (opaque binary)                         -> 'scanned'
    """
    if data.startswith(b"%PDF-"):
        if pdf_text_len(data) < MIN_TEXT_LAYER_CHARS:
            return "scanned"
        return "pdf"
    head = data[:4096].lstrip().lower()
    if (
        head.startswith(b"<!doctype")
        or b"<html" in head
        or b"<body" in head
        or _HTML_SNIFF.search(head) is not None
    ):
        return "html"
    return "scanned"
