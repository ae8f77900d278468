"""Watermarked windowed aggregation: streaming result == batch result."""

from gonova_document_parser_spark.streaming.windowed import windowed_event_counts


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    src = "/root/testdata/sf0.001/events.parquet"
    batch = spark.read.parquet(src)

    expected = {
        (r["window_start"], r["event_type"]): (r["c"], r["sum_value"])
        for r in windowed_event_counts(batch).collect()
    }
    assert expected  # non-trivial input

    batch.write.parquet(str(tmp_path / "in"), mode="overwrite")
    stream = spark.readStream.schema(batch.schema).parquet(
        str(tmp_path / "in")
    )
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        (r["window_start"], r["event_type"]): (r["c"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert got == expected
