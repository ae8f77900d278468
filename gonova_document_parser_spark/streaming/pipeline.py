"""Structured-Streaming ingest: continuous crawl -> extracted table.

The reference's Redis/RQ queue (``queue.py``, ``worker.py:118-144``) is work
orchestration, not a data stream — Spark's scheduler already subsumes it for
batch (SURVEY §2.2).  This module covers the genuinely streaming ingest case
(a crawler appending page files): ``readStream`` -> the same stage-fused
extraction operator -> ``writeStream`` with checkpointing, so exactly-once
delivery comes from the streaming engine rather than our batch checkpoint
table.  The extraction operator is shared verbatim with the batch path —
same bytes out.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..corpus import PAGES_DDL
from ..operators.extract import extract_pages


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Stream parquet page files from ``input_dir`` into extracted parquet.

    ``available_now=True`` drains the backlog and stops (batch-like tests);
    in production leave it False for continuous micro-batches.
    """
    reader = spark.readStream.schema(PAGES_DDL)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    pages = reader.parquet(input_dir)
    extracted = extract_pages(pages)
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
