"""Top-level per-document extraction API — classify -> route -> extract ->
ordered merge, with exact reference byte formats (pure Python, no Spark).

Byte contracts grafted from the reference:
  - page merge: ``<!-- Page {n} -->\\n\\n{content}`` joined by
    ``\\n\\n---\\n\\n``  (``async_processor.py:273-293`` and
    ``mineru_processor.py:333-348`` — both generations use this format).
  - error marker: ``[Error processing page {n}: {msg}]``
    (``mineru_processor.py:255-258``).

This module is the oracle; ``operators/extract.py`` runs the same function
inside Arrow batches, so engine output is byte-identical by construction.
"""

from __future__ import annotations

from .classify import MIN_TEXT_LAYER_CHARS, classify_page_type
from .htmlx import extract_html_blocks
from .pdfx import parse_pdf

PAGE_SEPARATOR = "\n\n---\n\n"
BLOCK_SEPARATOR = "\n\n"

NO_TEXT_LAYER_MSG = "no extractable text layer"


def fake_scanned_extract(data: bytes) -> list[list[tuple[str, str]]]:
    """STUB OCR — deterministic stand-in for a real scanned-page extractor.

    The reference's scanned path is GPU OCR (``mineru_processor.py:264-331``),
    which needs model weights not present in this container.  This fake mirrors
    ``operators/multimodal.decode_media``'s strict/fake pattern: it derives a
    reproducible pseudo-text from the payload hash so the *plumbing* (routing,
    merge bytes, span offsets, error policy) is testable end-to-end.  Plug a
    real OCR callable with the same signature into ``extract_document``'s
    ``scanned_extractor`` to go live.
    """
    import hashlib

    digest = hashlib.sha256(data).hexdigest()
    words = [f"ocr-{digest[k : k + 8]}" for k in range(0, 32, 8)]
    return [[("block", " ".join(words))]]


def strict_scanned_extract(data: bytes) -> list[list[tuple[str, str]]]:
    """Strict-mode seam: raises exactly where a real OCR engine plugs in."""
    raise NotImplementedError(
        "scanned-page extraction requires an OCR engine; plug one in via "
        "extract_document(scanned_extractor=...)"
    )


def page_marker(page_num: int) -> str:
    """1-indexed page comment prefix (async_processor.py:288-291)."""
    return f"<!-- Page {page_num} -->"


def error_marker(page_num: int, msg: str) -> str:
    """Exact legacy error-row format (mineru_processor.py:258)."""
    return f"[Error processing page {page_num}: {msg}]"


def merge_pages(page_texts: list[str]) -> str:
    """Ordered merge with page markers — the A1 operator (SURVEY §2.1)."""
    return PAGE_SEPARATOR.join(
        f"{page_marker(i + 1)}\n\n{content}" for i, content in enumerate(page_texts)
    )


def _assemble(pages_blocks: list[list[tuple[str, str]]]):
    """[(kind,text)] per page -> (merged_text, spans, n_blocks).

    Spans are (start, end, kind) char offsets into the merged text covering
    content blocks only (page markers/separators carry no span).
    """
    page_texts: list[str] = []
    spans: list[tuple[int, int, str]] = []
    n_blocks = 0
    offset = 0
    for i, blocks in enumerate(pages_blocks):
        marker = f"{page_marker(i + 1)}\n\n"
        if i > 0:
            offset += len(PAGE_SEPARATOR)
        offset += len(marker)
        texts = []
        for j, (kind, text) in enumerate(blocks):
            if j > 0:
                offset += len(BLOCK_SEPARATOR)
            spans.append((offset, offset + len(text), kind))
            offset += len(text)
            texts.append(text)
            n_blocks += 1
        page_texts.append(BLOCK_SEPARATOR.join(texts))
    return merge_pages(page_texts), spans, n_blocks


def extract_document(data: bytes, scanned_extractor=None) -> dict:
    """Classify and extract one document's raw bytes.

    ``scanned_extractor``: optional ``bytes -> [[(kind, text)]]`` callable for
    pages with no text layer (the OCR seam — ``fake_scanned_extract`` for
    tests, a real OCR engine in production).  ``None`` (default) preserves the
    deterministic error-row bytes; an extractor that raises also degrades to
    the error row (M3/M4 policy), never a task failure.

    Returns a plain dict (Arrow-friendly):
      page_type: 'html' | 'pdf' | 'scanned'
      extracted_text: merged text with page markers (byte contract)
      spans: [(start, end, kind)] into extracted_text
      n_blocks, success, error
    """
    if not isinstance(data, bytes):
        data = bytes(data)
    page_type = "scanned"  # default if classification itself fails
    try:
        # classify+extract share one parse for PDFs (single-pass rule,
        # OPTIMIZATIONS.md:5-11): parse_pdf yields blocks AND the
        # 50-char-rule char count, so the payload is deserialized once.
        if data.startswith(b"%PDF-"):
            # sniffed type first, so a parse failure reports page_type='pdf'
            # rather than 'scanned' for an identifiably-PDF payload
            page_type = "pdf"
            pages_blocks, text_chars = parse_pdf(data)
            page_type = "pdf" if text_chars >= MIN_TEXT_LAYER_CHARS else "scanned"
            if not pages_blocks:
                pages_blocks = [[]]
        else:
            page_type = classify_page_type(data)
            if page_type == "html":
                pages_blocks = [extract_html_blocks(data)]
        if page_type == "scanned" and scanned_extractor is not None:
            pages_blocks = scanned_extractor(data)
            if not pages_blocks:
                pages_blocks = [[]]
        elif page_type == "scanned":  # no extractor plugged -> deterministic error row
            msg = error_marker(1, NO_TEXT_LAYER_MSG)
            text, spans, _ = _assemble([[("error", msg)]])
            return {
                "page_type": page_type,
                "extracted_text": text,
                "spans": spans,
                "n_blocks": 0,
                "success": False,
                "error": msg,
            }
    except Exception as exc:  # semantic failure -> error row, never task failure
        msg = error_marker(1, str(exc))
        text, spans, _ = _assemble([[("error", msg)]])
        return {
            "page_type": page_type,
            "extracted_text": text,
            "spans": spans,
            "n_blocks": 0,
            "success": False,
            "error": msg,
        }

    text, spans, n_blocks = _assemble(pages_blocks)
    return {
        "page_type": page_type,
        "extracted_text": text,
        "spans": spans,
        "n_blocks": n_blocks,
        "success": True,
        "error": None,
    }
