"""Watermarked windowed aggregation over an event stream (§2.2 streaming).

The reference has no data stream (its Redis queue is work orchestration,
SURVEY §2.2), but a crawl pipeline monitoring its own extraction events
needs exactly this shape: event-time tumbling windows with a watermark to
bound state and admit late data.  Built on the standard Structured
Streaming operators — state store, late-data handling and exactly-once
come from the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts per key with late-data watermark.

    Works on both a streaming frame (``readStream``) and a batch frame
    (same code path — Spark batch ignores the watermark), so the batch
    oracle for the streaming query is the query itself on static input.
    """
    # watermarks require TIMESTAMP (tz-aware); parquet NTZ columns are cast
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            key_col,
            "c",
            "sum_value",
        )
    )
