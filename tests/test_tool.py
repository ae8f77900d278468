"""Single-document agent-tool API (U1) — Spark-free, byte-identical to the
pipeline (spec functions shared verbatim)."""

import json

from gonova_document_parser_spark.corpus import make_page
from gonova_document_parser_spark.spec import extract_document
from gonova_document_parser_spark.tool import process_document


def test_process_document_markdown_matches_pipeline(tmp_path):
    page = make_page(5)
    p = tmp_path / "doc.html"
    p.write_bytes(page["html"])
    out = process_document(str(p))
    assert out["success"] is True and out["error"] is None
    assert out["filename"] == "doc.html" and len(out["document_id"]) == 16
    assert out["content"] == extract_document(page["html"])["extracted_text"]
    assert out["metadata"]["page_type"] in ("html", "pdf")
    assert [n["id"] for n in out["nodes"]] == [f"page_{i}" for i in range(len(out["nodes"]))]
    assert len(out["edges"]) == len(out["nodes"]) - 1


def test_process_document_formats_and_bytes_input():
    from gonova_document_parser_spark.corpus import doc_to_page

    # doc_id % 10 <= 6 -> rendered html page (always extractable)
    page = doc_to_page(3, "twelve words of body text " * 4, "en")
    j = process_document(page["html"], output_format="json")
    parsed = json.loads(j["content"])
    assert parsed["success"] is True and parsed["nodes"]
    h = process_document(page["html"], output_format="html")
    assert h["content"].startswith("<!DOCTYPE html><html><body><pre>")
    # page markers' '<' is escaped inside the <pre> payload
    assert "&lt;!-- Page 1 -->" in h["content"]


def test_process_document_error_paths(tmp_path):
    missing = process_document(str(tmp_path / "nope.pdf"))
    assert missing["success"] is False and "File not found" in missing["error"]
    bad = process_document(b"\x00\x01 opaque")
    assert bad["success"] is False
    assert bad["error"] == "[Error processing page 1: no extractable text layer]"
    assert bad["content"].endswith(bad["error"])


def test_process_document_output_key_parity():
    """Output dict carries exactly the reference tool's field names
    (agent_tool.py:42-59), vqa_answers included (always None — the
    reference's VQA stage is a stub)."""
    expected = {
        "success",
        "document_id",
        "filename",
        "content",
        "nodes",
        "edges",
        "metadata",
        "signatures",
        "vqa_answers",
        "error",
    }
    page = make_page(2)
    out = process_document(page["html"])
    assert set(out.keys()) == expected
    assert out["vqa_answers"] is None
    missing = process_document("/nonexistent/never.pdf")
    assert set(missing.keys()) == expected
    assert missing["vqa_answers"] is None


def test_process_document_signatures():
    doc = (
        b"<html><body><div><p>intro paragraph with enough text to matter</p>"
        b"<p>Signed by the board</p><p>Authorized Signatory</p></div></body>"
    )
    out = process_document(doc)
    assert any("Signed by the board" in s for s in out["signatures"])
    out2 = process_document(doc, extract_signatures=False)
    assert out2["signatures"] == []
