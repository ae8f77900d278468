"""Single-document agent-tool API — the reference's U1 surface, Spark-free.

Grafts ``DocumentProcessingTool.run`` (``agent_tool.py:62-229``): one file
or payload in, a structured dict out — success flag, document id, content
in markdown/json/html, graph nodes/edges, signature hits, metadata, error.
The heavy lifting is the same ``spec`` functions the Spark UDFs run, so a
document processed here is byte-identical to the same document flowing
through the cluster pipeline; for corpus-scale work use
``operators.extract.extract_pages`` instead.
"""

from __future__ import annotations

import hashlib
import json
import time
from pathlib import Path

from .spec import PAGE_SEPARATOR, extract_document

FORMATS = ("markdown", "json", "html")

_SIG_KEYWORDS = ("signature", "signed", "authorized", "signatory")


def _nodes_edges(extracted_text: str) -> tuple[list[dict], list[dict]]:
    """Page nodes + follows edges — same shapes as operators/graph.py."""
    parts = extracted_text.split(PAGE_SEPARATOR)
    nodes = [
        {
            "id": f"page_{i}",
            "type": "page",
            "content": content,
            "page": i + 1,
            "level": 0,
        }
        for i, content in enumerate(parts)
    ]
    edges = [
        {"source": f"page_{i}", "target": f"page_{i + 1}", "type": "follows"}
        for i in range(len(parts) - 1)
    ]
    return nodes, edges


def _render(fmt: str, extracted_text: str, nodes, edges, meta) -> str:
    """Same format semantics as sources/export.py render_expr."""
    if fmt == "markdown":
        return extracted_text
    if fmt == "json":
        return json.dumps(
            {
                "page_type": meta["page_type"],
                "nodes": nodes,
                "edges": edges,
                "success": meta["success"],
            },
            sort_keys=True,
        )
    if fmt == "html":
        escaped = extracted_text.replace("&", "&amp;").replace("<", "&lt;")
        return f"<!DOCTYPE html><html><body><pre>{escaped}</pre></body></html>"
    raise ValueError(f"unknown format {fmt!r}; one of {FORMATS}")


def process_document(
    source,
    output_format: str = "markdown",
    extract_signatures: bool | None = None,
    scanned_extractor=None,
) -> dict:
    """Process ONE document (path or raw bytes) -> structured dict.

    Mirrors the reference tool's output schema (``agent_tool.py:42-59``):
    {success, document_id, filename, content, nodes, edges, metadata,
    signatures, vqa_answers, error} — ``vqa_answers`` is always None, as in
    the reference (its VQA stage is a stub; SURVEY §2.1 says do not build).
    ``scanned_extractor`` is the same OCR seam as
    ``spec.extract_document``.  Never raises on document content — bad
    payloads come back as ``success=False`` with the exact error-marker
    bytes the pipeline emits.
    """
    if output_format not in FORMATS:
        raise ValueError(f"unknown format {output_format!r}; one of {FORMATS}")
    if isinstance(source, (str, Path)):
        p = Path(source)
        if not p.exists():
            return {
                "success": False,
                "document_id": "",
                "filename": p.name,
                "content": "",
                "nodes": [],
                "edges": [],
                "metadata": {},
                "signatures": [],
                "vqa_answers": None,
                "error": f"File not found: {p}",
            }
        data = p.read_bytes()
        filename = p.name
    else:
        data = bytes(source)
        filename = ""
    t0 = time.time()
    r = extract_document(data, scanned_extractor=scanned_extractor)
    nodes, edges = _nodes_edges(r["extracted_text"])
    signatures = []
    if extract_signatures or extract_signatures is None:
        signatures = sorted(
            {
                line.strip()
                for line in r["extracted_text"].splitlines()
                if any(k in line.lower() for k in _SIG_KEYWORDS)
            }
        )
    meta = {
        "page_type": r["page_type"],
        "n_blocks": r["n_blocks"],
        "n_pages": len(nodes),
        "payload_bytes": len(data),
        "processing_seconds": round(time.time() - t0, 6),
        "success": r["success"],
    }
    return {
        "success": r["success"],
        "document_id": hashlib.sha256(data).hexdigest()[:16],
        "filename": filename,
        "content": _render(output_format, r["extracted_text"], nodes, edges, meta),
        "nodes": nodes,
        "edges": edges,
        "metadata": meta,
        "signatures": signatures,
        "vqa_answers": None,  # stubbed in the reference too (agent_tool.py:54-56)
        "error": r["error"],
    }
