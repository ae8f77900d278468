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


def test_stream_dedup_stateful(spark, tmp_path):
    """applyInPandasWithState streaming dedup: first occurrence of each
    content fingerprint per host survives; re-fetched duplicates are
    dropped, including across micro-batches (state persists)."""
    import pyspark.sql.functions as F

    from gonova_document_parser_spark.corpus import PAGES_DDL
    from gonova_document_parser_spark.streaming.stateful import stream_dedup

    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    base = generate_pages(spark, 40, num_partitions=2)
    base.write.parquet(inp)  # batch 1: 40 originals

    def drain():
        pages = spark.readStream.schema(PAGES_DDL).option(
            "maxFilesPerTrigger", "1"
        ).parquet(inp)
        q = (
            stream_dedup(pages)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)

    drain()
    first = spark.read.parquet(out)
    n_first = first.count()
    assert n_first == first.select("fp").distinct().count()  # no dup fp emitted

    # batch 2: re-fetches (same text => same fingerprint, different urls)
    refetch = base.limit(10).withColumn("url", F.concat(F.col("url"), F.lit("?retry=1")))
    refetch.write.mode("append").parquet(inp)
    drain()
    again = spark.read.parquet(out)
    # state persisted across drains: the 10 re-fetches added ZERO rows
    assert again.count() == n_first
    assert again.select("fp").distinct().count() == n_first
