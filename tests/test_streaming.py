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


def test_stream_curate_equals_batch(spark, tmp_path):
    """Per-document curation stages through the streaming path produce
    byte-identical rows to the same expressions run in batch — including
    a planted blocked-domain page and a noindex page that must be gated
    out BEFORE extraction on both paths."""
    import pyspark.sql.functions as F

    from gonova_document_parser_spark.functions.governance import (
        domain_blocked_expr,
        robots_noindex_expr,
    )
    from gonova_document_parser_spark.functions.textstats import (
        gopher_flags,
        lang_id_expr,
        quality_score_expr,
    )
    from gonova_document_parser_spark.operators.extract import extract_pages
    from gonova_document_parser_spark.streaming.pipeline import stream_curate

    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    pages = generate_pages(spark, 80, num_partitions=2)
    extra = spark.createDataFrame(
        [
            ("https://spam.example.net/x",
             b"<html><body><div><p>" + b"blocked words " * 20 + b"</p></div></body></html>"),
            ("https://docs.example.com/noidx",
             b'<html><head><meta name="robots" content="noindex"></head><body><div><p>'
             + b"opted out words " * 20 + b"</p></div></body></html>"),
        ],
        "url string, html binary",
    ).select(
        "url", F.lit(None).cast("timestamp").alias("warc_ts"), "html",
        F.lit("").alias("text"), F.lit("und").alias("lang"),
    )
    pages.unionByName(extra).write.parquet(inp)

    q = stream_curate(spark, inp, out, ckpt, blocked_domains=["spam.example.net"])
    assert q.awaitTermination(180)
    streamed = {
        (r["url"], r["text"], r["lang"], r["quality"], r["gopher_keep"])
        for r in spark.read.parquet(out).collect()
    }

    batch_pages = spark.read.parquet(inp)
    admitted = batch_pages.where(
        ~domain_blocked_expr(["spam.example.net"])
        & ~robots_noindex_expr(F.col("html").cast("string"))
    )
    ex = extract_pages(admitted).where(F.col("success"))
    gf = gopher_flags("extracted_text")
    batch = {
        (r["url"], r["text"], r["lang"], r["quality"], r["gopher_keep"])
        for r in ex.select(
            "url",
            F.col("extracted_text").alias("text"),
            lang_id_expr("extracted_text").alias("lang"),
            F.round(quality_score_expr("extracted_text"), 6).alias("quality"),
            gf["keep"].alias("gopher_keep"),
        ).collect()
    }
    assert streamed == batch
    urls = {u for u, *_ in streamed}
    assert "https://spam.example.net/x" not in urls
    assert "https://docs.example.com/noidx" not in urls
    # every successfully-extracted corpus page came through (the corpus
    # plants some scanned/error pages, which success=False drops on BOTH
    # paths identically)
    assert len(urls) == ex.count() > 60
