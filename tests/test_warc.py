"""WARC source: record parse round-trip + Spark fan-out + extraction,
plus the committed Common-Crawl-layout fixture (charset/tag-soup/rotated-PDF
real-world constructs the synthetic generators can't invent)."""

import gzip
import hashlib
import pathlib

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


FIXTURE = pathlib.Path(__file__).parent / "fixtures" / "cc_sample.warc.gz"


def test_cc_fixture_bytes_pinned():
    """The committed fixture is byte-pinned; regenerate with
    tests/fixtures/make_cc_sample.py (deterministic, gzip mtime=0)."""
    h = hashlib.sha256(FIXTURE.read_bytes()).hexdigest()
    assert h == "7273fb130b82467373ab8d1a6cff2e1b2d95be914bc37d3a3526e83a35e153f7"


def test_cc_fixture_layout_parses():
    """Member-per-record gzip (real CC layout): 8 responses come back;
    warcinfo and request records are skipped."""
    recs = list(iter_warc_records(FIXTURE.read_bytes()))
    assert len(recs) == 8
    assert all(r["warc_ts"] is not None for r in recs)
    assert "https://docs.example.com/rotated.pdf" in [r["url"] for r in recs]


def test_cc_fixture_extraction_deterministic_and_bounded(spark):
    """Real-world constructs through the full Spark path: declared legacy
    charsets decode, raw-text traps don't leak, the rotated+octal PDF
    extracts upright, extraction hashes are stable across two runs, and
    error rows are exactly the two deliberate junk responses."""
    pages = read_warc(spark, str(FIXTURE.parent))

    def run():
        rows = sorted(
            (r["url"], r["extracted_text"], r["success"])
            for r in extract_pages(pages).collect()
        )
        return rows, hashlib.sha256(repr(rows).encode()).hexdigest()

    rows1, h1 = run()
    rows2, h2 = run()
    assert h1 == h2  # deterministic across runs
    by_url = {u: (t, s) for u, t, s in rows1}
    assert len(by_url) == 8
    # charset paths: ISO-8859-1 meta, windows-1252 meta, UTF-8 BOM
    assert "pâtissier têtu" in by_url["https://cafe.example.fr/"][0]
    assert "“Smart quotes”" in by_url["https://news.example.com/quotes"][0]
    assert "東京ガイド" in by_url["https://tokyo.example.jp/guide"][0]
    # raw-text traps: nothing from <script>/<style> strings leaks
    trap = by_url["https://trap.example.com/js"][0]
    assert "not content" not in trap and "Visible article text" in trap
    # entities normalize into prose
    assert "café serves espresso" in by_url["https://legacy.example.org/entities"][0]
    # the application/pdf response: rotated text matrix + octal escape, read
    # upright through the text-layer path
    assert by_url["https://docs.example.com/rotated.pdf"][0].endswith(
        "Rotated Archive page with a text layer\n"
        "second rotated line clears the 50-char rule"
    )
    errs = sorted(u for u, (t, s) in by_url.items() if not s)
    assert errs == [
        "https://broken.example.net/truncated",
        "https://empty.example.net/nobody",
    ]
