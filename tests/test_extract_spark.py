"""Engine-vs-oracle byte identity through Spark, partitioning independence,
hostile payloads, passthrough columns, and multimodal plumbing."""

import datetime

import pyspark.sql.functions as F
import pytest

from gonova_document_parser_spark.corpus import generate_pages, make_page, build_pdf, _rng
from gonova_document_parser_spark.operators.extract import extract_pages
from gonova_document_parser_spark.operators.multimodal import (
    MEDIA_FEATURE_DIM,
    decode_media,
    media_features,
)
from gonova_document_parser_spark.spec import extract_document

N_DOCS = 200


@pytest.fixture(scope="module")
def corpus(spark):
    return generate_pages(spark, N_DOCS, num_partitions=4).cache()


def test_byte_identity_vs_oracle(spark, corpus):
    got = {r["url"]: r for r in extract_pages(corpus).collect()}
    assert len(got) == N_DOCS
    for i in range(N_DOCS):
        page = make_page(i)
        oracle = extract_document(page["html"])
        row = got[page["url"]]
        assert row["extracted_text"] == oracle["extracted_text"], page["url"]
        assert row["page_type"] == oracle["page_type"]
        assert row["success"] == oracle["success"]
        assert [
            (s["start"], s["end"], s["kind"]) for s in row["spans"]
        ] == oracle["spans"]


def test_partitioning_order_independence(spark, corpus):
    a = extract_pages(corpus.repartition(1)).select("url", "extracted_text")
    b = extract_pages(corpus.repartition(16, F.xxhash64("url"))).select(
        "url", "extracted_text"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_hostile_payloads_become_error_rows(spark):
    ts = datetime.datetime(2025, 1, 1)
    pdf = build_pdf(_rng(1, 42))
    rows = [
        ("u1", ts, b"\x00\xff\xfe garbage \x80"),
        ("u2", ts, pdf[: len(pdf) // 3]),
        ("u3", ts, b""),
        ("u4", ts, None),
        ("u5", ts, b"<div><p>soup <b>deep " * 2000),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")
    got = {r["url"]: r for r in extract_pages(df).collect()}
    assert len(got) == 5  # no task failures
    for u in ("u1", "u2", "u3", "u4"):
        assert got[u]["success"] is False
        assert got[u]["error"].startswith("[Error processing page 1:")
    assert got["u5"]["success"] is True  # depth-capped parse succeeds
    assert "soup" in got["u5"]["extracted_text"]


def test_passthrough_columns(spark, corpus):
    df = corpus.withColumn("tag", F.lit(7).cast("int"))
    out = extract_pages(df, passthrough=("tag",))
    assert "tag" in out.columns
    assert out.where(F.col("tag") != 7).count() == 0


def test_media_features_plumbing(spark, corpus):
    out = media_features(corpus.limit(20), fake=True)
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        assert r["error"] is None
        assert len(r["features"]) == MEDIA_FEATURE_DIM
        assert r["n_bytes"] > 0


def test_media_decode_strict_mode_is_stub():
    with pytest.raises(NotImplementedError):
        decode_media(b"xx", "image", fake=False)


def test_extraction_plan_is_narrow(spark, corpus):
    """No shuffle (Exchange) in the extraction plan itself."""
    plan = extract_pages(corpus)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
