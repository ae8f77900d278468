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


def stream_curate(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    blocked_domains: list[str] | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming front of the curation pipeline: governance gate ->
    extraction -> per-document quality columns (Gopher keep flag, lang,
    quality score), written append-mode with exactly-once checkpointing.

    Only the PER-DOCUMENT stages stream — they are stateless maps/
    filters, so stream == batch byte-for-byte (pinned in tests).  The
    corpus-WIDE stages (line dedup, exact dedup, domain cap, packing)
    are deliberately batch jobs over the accumulated table: their
    semantics depend on the whole corpus, and recomputing them per
    micro-batch would change results with arrival order (the
    stateful-dedup module covers the streaming-native variant with
    explicit cross-batch state instead).
    """
    from pyspark.sql import functions as F

    from ..functions.governance import domain_blocked_expr, robots_noindex_expr
    from ..functions.textstats import gopher_flags, lang_id_expr, quality_score_expr

    pages = spark.readStream.schema(PAGES_DDL).parquet(input_dir)
    # coalesce to False: NULL hosts/html must ADMIT, not silently drop
    # (same null-semantics rule as the batch job)
    admitted = pages.where(
        ~F.coalesce(domain_blocked_expr(list(blocked_domains or [])), F.lit(False))
        & ~F.coalesce(
            robots_noindex_expr(F.col("html").cast("string")), F.lit(False)
        )
    )
    extracted = extract_pages(admitted).where(F.col("success"))
    gf = gopher_flags("extracted_text")
    curated = extracted.select(
        "url",
        "warc_ts",
        F.col("extracted_text").alias("text"),
        lang_id_expr("extracted_text").alias("lang"),
        F.round(quality_score_expr("extracted_text"), 6).alias("quality"),
        gf["keep"].alias("gopher_keep"),
    )
    writer = (
        curated.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
