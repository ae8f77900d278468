"""Fixtures for graph structure (A2), analyzer/router (S4/C3/C5),
signatures (M5), export switch (A3), and embedding plumbing (M9)."""

import datetime
import json

import pyspark.sql.functions as F
import pytest

from gonova_document_parser_spark.corpus import _rng, build_html, build_pdf, build_scanned
from gonova_document_parser_spark.operators.analyze import (
    analyze_document,
    analyze_pages,
    explain_routing,
)
from gonova_document_parser_spark.operators.extract import extract_pages
from gonova_document_parser_spark.operators.graph import graph_structure
from gonova_document_parser_spark.sources.export import export_extracted, render_expr
from gonova_document_parser_spark.functions.embeddings import EMBED_DIM, embed_expr
from gonova_document_parser_spark.functions.signatures import (
    has_signature_expr,
    signature_lines_expr,
)
from gonova_document_parser_spark.spec import PAGE_SEPARATOR

TS = datetime.datetime(2025, 1, 1)


@pytest.fixture(scope="module")
def extracted(spark):
    rows = [
        ("u-pdf", TS, build_pdf(_rng(2, 42))),  # deterministic multi-page
        ("u-html", TS, build_html(_rng(3, 42))),
        ("u-scan", TS, build_scanned(_rng(4, 42))),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")
    return extract_pages(df).cache()


def test_graph_structure_matches_reference_shape(spark, extracted):
    g = {r["url"]: r for r in graph_structure(extracted).collect()}
    for url, row in g.items():
        n = row["n_pages"]
        assert len(row["nodes"]) == n
        assert len(row["edges"]) == (n - 1 if n > 1 else 0)
        for i, node in enumerate(row["nodes"]):
            assert node["id"] == f"page_{i}"  # hybrid_processor.py:210 format
            assert node["type"] == "page"
            assert node["page"] == i + 1
            assert node["level"] == 0
            assert node["content"].startswith(f"<!-- Page {i + 1} -->")
        for i, edge in enumerate(row["edges"]):
            assert edge["source"] == f"page_{i}"
            assert edge["target"] == f"page_{i + 1}"
            assert edge["type"] == "follows"
    # reconstruction: joining node contents with the separator = original text
    ext = {r["url"]: r["extracted_text"] for r in extracted.collect()}
    for url, row in g.items():
        assert PAGE_SEPARATOR.join(n["content"] for n in row["nodes"]) == ext[url]


def test_analyzer_pure_and_spark_agree(spark, extracted):
    rows = [
        ("a", TS, build_pdf(_rng(5, 42))),
        ("b", TS, build_scanned(_rng(6, 42))),
        ("c", TS, b"<html><form><input type='text'></form><img src='x'>hello</html>"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")
    got = {r["url"]: r.asDict() for r in analyze_pages(df).collect()}
    for url, _, payload in rows:
        oracle = analyze_document(payload)
        for k, v in oracle.items():
            assert got[url][k] == v, (url, k)
    assert got["c"]["has_forms"] and got["c"]["has_images"]


def test_routing_decision_and_reason(spark):
    rows = [
        ("forms", TS, b"<html><form><input></form>long text " + b"x" * 100),
        ("lowtext", TS, build_scanned(_rng(7, 42))),
        ("standard", TS, build_html(_rng(8, 42))),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")
    routed = {r["url"]: r for r in explain_routing(analyze_pages(df)).collect()}
    assert routed["forms"]["route"] == "nanonets"
    assert "forms" in routed["forms"]["route_reason"]
    assert routed["lowtext"]["route"] == "deepseek-ocr"
    assert routed["standard"]["route"] == "deepseek"


def test_enrich_decision(spark):
    # C4 (router.py:91-112): enrich iff deepseek route AND (big OR images)
    rows = [
        ("img", TS, b"<html><img src='x'>plenty of running text here" + b" word" * 50),
        ("plain", TS, b"<html><p>plenty of running text</p>" + b" word" * 50),
        ("forms", TS, b"<html><form><input></form>" + b" word" * 50),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")
    got = {r["url"]: r for r in explain_routing(analyze_pages(df)).collect()}
    assert got["img"]["route"] == "deepseek" and got["img"]["should_enrich"] is True
    assert got["plain"]["should_enrich"] is False
    assert got["forms"]["route"] == "nanonets" and got["forms"]["should_enrich"] is False


def test_catalog_table_roundtrip(spark):
    """Iceberg-style path: write_pages/read_pages through a catalog table
    name (managed table in the session catalog — same writeTo() code path
    an Iceberg catalog would take)."""
    from gonova_document_parser_spark.corpus import generate_pages
    from gonova_document_parser_spark.sources import read_pages, write_pages

    pages = generate_pages(spark, 50, num_partitions=2)
    write_pages(pages, "pages_t")
    back = read_pages(spark, "pages_t")
    assert back.columns == ["url", "warc_ts", "html", "text", "lang"]
    assert back.count() == 50
    spark.sql("DROP TABLE pages_t")


def test_catalog_write_uses_v2_writeTo_first(spark, monkeypatch):
    """For a catalog table name, write_pages must take the V2 ``writeTo``
    API (what an Iceberg catalog implements) and NOT fall back to V1
    ``saveAsTable`` when V2 succeeds.  No Iceberg jar ships in this
    container, so V2 success is simulated; the real fallback path is
    covered by test_catalog_table_roundtrip."""
    from gonova_document_parser_spark.corpus import generate_pages
    from gonova_document_parser_spark.sources import write_pages

    calls = []

    class FakeV2Writer:
        def createOrReplace(self):
            calls.append("v2_createOrReplace")

    pages = generate_pages(spark, 5, num_partitions=1)
    cls = type(pages)  # patch the concrete DataFrame class (classic/connect)
    monkeypatch.setattr(
        cls, "writeTo", lambda self, t: calls.append(("writeTo", t)) or FakeV2Writer()
    )

    class ExplodingV1:
        def __getattr__(self, _):
            raise AssertionError("V1 write path used despite V2 success")

    monkeypatch.setattr(cls, "write", property(lambda self: ExplodingV1()))
    write_pages(pages, "iceberg.db.pages")
    assert calls == [("writeTo", "iceberg.db.pages"), "v2_createOrReplace"]


def test_signature_detection(spark):
    df = spark.createDataFrame(
        [
            (1, "intro\nSigned by the board\nAuthorized Signatory\nend"),
            (2, "no keywords at all\nplain line"),
        ],
        "doc_id long, extracted_text string",
    )
    got = {r["doc_id"]: r for r in df.select(
        "doc_id",
        signature_lines_expr().alias("sigs"),
        has_signature_expr().alias("has_sig"),
    ).collect()}
    assert got[1]["has_sig"] is True
    assert got[1]["sigs"] == ["Signed by the board", "Authorized Signatory"]
    assert got[2]["has_sig"] is False and got[2]["sigs"] == []


def test_export_formats(spark, extracted, tmp_path):
    for fmt in ("markdown", "json", "html"):
        export_extracted(extracted, str(tmp_path), fmt)
        out = spark.read.parquet(f"{tmp_path}/fmt={fmt}")
        assert out.count() == 3
    md = dict(spark.read.parquet(f"{tmp_path}/fmt=markdown").collect())
    ext = {r["url"]: r["extracted_text"] for r in extracted.collect()}
    assert md == ext  # markdown payload IS the extracted text
    j = dict(spark.read.parquet(f"{tmp_path}/fmt=json").collect())
    parsed = json.loads(j["u-pdf"])
    assert parsed["url"] == "u-pdf" and parsed["nodes"][0]["id"] == "page_0"
    h = dict(spark.read.parquet(f"{tmp_path}/fmt=html").collect())
    assert h["u-html"].startswith("<!DOCTYPE html>") and "&lt;" in h["u-html"]


def test_embedding_stub_plumbing(spark):
    df = spark.createDataFrame([(1, "hello world"), (2, "")], "id long, text string")
    rows = {r["id"]: r["emb"] for r in df.select("id", embed_expr("text").alias("emb")).collect()}
    assert len(rows[1]) == EMBED_DIM
    norm = sum(v * v for v in rows[1]) ** 0.5
    assert abs(norm - 1.0) < 1e-3  # L2-normalized
    # deterministic across invocations
    again = {r["id"]: r["emb"] for r in df.select("id", embed_expr("text").alias("emb")).collect()}
    assert again == rows
