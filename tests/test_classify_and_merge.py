"""Classifier decision table + exact byte formats of merge/error markers.

The byte formats are the reference's: page marker and separator from
``async_processor.py:288-293`` / ``mineru_processor.py:333-348``, error
marker from ``mineru_processor.py:258``, and the <50-char text-layer rule
from ``page_classifier.py:94-106``.
"""

from gonova_document_parser_spark.corpus import _rng, build_html, build_pdf, build_scanned
from gonova_document_parser_spark.spec import (
    PAGE_SEPARATOR,
    classify_page_type,
    error_marker,
    extract_document,
    merge_pages,
    page_marker,
)


def test_classifier_decision_table():
    assert classify_page_type(b"<!DOCTYPE html><body>x</body>") == "html"
    assert classify_page_type(b"  \n <html><p>x</p>") == "html"
    assert classify_page_type(b"<div class='a'>text</div>") == "html"
    assert classify_page_type(b"plain text, no markup") == "scanned"
    assert classify_page_type(b"\x89PNG\r\n\x1a\n binary") == "scanned"
    assert classify_page_type(b"") == "scanned"
    rng = _rng(3, 42)
    assert classify_page_type(build_pdf(rng)) == "pdf"
    assert classify_page_type(build_scanned(_rng(4, 42))) == "scanned"
    assert classify_page_type(build_html(_rng(5, 42))) == "html"


def test_pdf_50_char_threshold_boundary():
    def pdf_with_text(s: bytes) -> bytes:
        data = b"BT 1 0 0 1 50 700 Tm (" + s + b") Tj ET"
        head = b"%PDF-1.4\n1 0 obj\n"
        return (
            head
            + b"<< /Length %d >>\nstream\n" % len(data)
            + data
            + b"\nendstream\nendobj\n%%EOF\n"
        )

    assert classify_page_type(pdf_with_text(b"x" * 49)) == "scanned"
    assert classify_page_type(pdf_with_text(b"x" * 50)) == "pdf"


def test_page_marker_and_separator_bytes():
    assert page_marker(1) == "<!-- Page 1 -->"
    assert PAGE_SEPARATOR == "\n\n---\n\n"
    merged = merge_pages(["first page", "second page"])
    assert merged == "<!-- Page 1 -->\n\nfirst page\n\n---\n\n<!-- Page 2 -->\n\nsecond page"


def test_error_marker_bytes():
    assert error_marker(3, "boom") == "[Error processing page 3: boom]"
    r = extract_document(b"\x00\x01opaque")
    assert r["success"] is False
    assert r["error"] == "[Error processing page 1: no extractable text layer]"
    assert r["extracted_text"] == "<!-- Page 1 -->\n\n" + r["error"]
    assert r["spans"] == [(17, 17 + len(r["error"]), "error")]


def test_spans_index_into_extracted_text():
    rng = _rng(11, 42)
    r = extract_document(build_pdf(rng))
    text = r["extracted_text"]
    prev_end = -1
    for start, end, kind in r["spans"]:
        assert 0 <= start <= end <= len(text)
        assert start >= prev_end  # sorted, non-overlapping
        prev_end = end
        assert kind in ("heading", "paragraph", "list", "block", "error")
    assert r["n_blocks"] == len(r["spans"])


def test_scanned_extractor_seam():
    """OCR plug-point (VERDICT r1 #6): fake mode extracts, strict raises ->
    error row, default mode keeps the exact legacy error bytes."""
    from gonova_document_parser_spark.spec import (
        fake_scanned_extract,
        strict_scanned_extract,
    )

    scanned = b"\x00\x01opaque scanned payload"
    # default: deterministic error row, bytes unchanged
    r0 = extract_document(scanned)
    assert r0["success"] is False
    assert r0["error"] == "[Error processing page 1: no extractable text layer]"
    # fake OCR: flows through the normal assemble path with markers + spans
    r1 = extract_document(scanned, scanned_extractor=fake_scanned_extract)
    assert r1["success"] is True
    assert r1["page_type"] == "scanned"
    assert r1["extracted_text"].startswith("<!-- Page 1 -->\n\n" + "ocr-")
    assert r1["n_blocks"] == 1
    # deterministic: same payload -> same bytes
    assert extract_document(scanned, scanned_extractor=fake_scanned_extract) == r1
    # strict: NotImplementedError degrades to an error row, not a crash
    r2 = extract_document(scanned, scanned_extractor=strict_scanned_extract)
    assert r2["success"] is False
    assert "scanned-page extraction requires an OCR engine" in r2["error"]


def test_malformed_pdf_reports_pdf_page_type(monkeypatch):
    """ADVICE r1: a '%PDF-' payload whose parse raises must report
    page_type='pdf', not 'scanned' (the sniffed type survives the error)."""
    from gonova_document_parser_spark.spec import api as spec_api

    def boom(data):
        raise ValueError("corrupt xref")

    monkeypatch.setattr(spec_api, "parse_pdf", boom)
    r = spec_api.extract_document(b"%PDF-1.7\n" + b"\xff" * 40)
    assert r["success"] is False
    assert r["page_type"] == "pdf"
    assert r["error"] == "[Error processing page 1: corrupt xref]"
