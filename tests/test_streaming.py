"""Structured-Streaming ingest fixture: availableNow drain through the
shared extraction operator, exactly-once via the stream checkpoint."""

from gonova_document_parser_spark.corpus import generate_pages, make_page
from gonova_document_parser_spark.spec import extract_document
from gonova_document_parser_spark.streaming import stream_extract


def test_stream_extract_drains_and_is_exactly_once(spark, tmp_path):
    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    generate_pages(spark, 120, num_partitions=2).write.parquet(inp)

    q = stream_extract(spark, inp, out, ckpt)
    assert q.awaitTermination(180)
    result = spark.read.parquet(out)
    assert result.count() == 120
    # byte-identity holds through the streaming path too
    row = result.where(result.url == make_page(5)["url"]).collect()[0]
    assert row["extracted_text"] == extract_document(make_page(5)["html"])["extracted_text"]

    # second drain with same checkpoint: no new data, no duplicates
    q2 = stream_extract(spark, inp, out, ckpt)
    assert q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 120
