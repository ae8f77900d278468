"""WARC source: record parse round-trip + Spark fan-out + extraction."""

import gzip

from gonova_document_parser_spark.corpus import make_page
from gonova_document_parser_spark.operators.extract import extract_pages
from gonova_document_parser_spark.sources.warc import (
    iter_warc_records,
    read_warc,
    write_warc,
)
from gonova_document_parser_spark.spec import extract_document


def _records(n=20, offset=0):
    pages = [make_page(i + offset) for i in range(n)]
    return [
        {"url": p["url"], "warc_ts": p["warc_ts"].replace(microsecond=0), "body": p["html"]}
        for p in pages
    ]


def test_warc_roundtrip_pure():
    recs = _records(10)
    data = write_warc(recs)
    back = list(iter_warc_records(data))
    assert [(r["url"], r["body"]) for r in back] == [
        (r["url"], r["body"]) for r in recs
    ]
    assert all(a["warc_ts"] == b["warc_ts"] for a, b in zip(back, recs))


def test_warc_gzip_archive():
    data = gzip.compress(write_warc(_records(5)))
    assert len(list(iter_warc_records(data))) == 5


def test_warc_skips_non_response_records():
    data = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\ninfo\r\n\r\n"
        + write_warc(_records(3))
    )
    assert len(list(iter_warc_records(data))) == 3


def test_read_warc_spark_and_extract(spark, tmp_path):
    for k in range(3):  # three WARC files fan out across tasks
        (tmp_path / f"part{k}.warc").write_bytes(write_warc(_records(8, offset=k * 8)))
    pages = read_warc(spark, str(tmp_path))
    assert pages.count() == 24
    got = {r["url"]: r["extracted_text"] for r in extract_pages(pages).collect()}
    for i in range(24):
        p = make_page(i)
        assert got[p["url"]] == extract_document(p["html"])["extracted_text"]
