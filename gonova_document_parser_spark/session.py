"""SparkSession factory with the engine's tuned defaults.

Settings mirror the reference's hand-tuned physical choices where an
equivalent exists (SURVEY §4): Arrow batch size ~64 docs ↔ the reference's
BATCH_SIZE=64 page batching (``config.py:44-47``); AQE on for runtime skew
handling (the reference has none); dynamic partition overwrite for
idempotent per-partition checkpointed writes (§ checkpoint module).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ARROW_DOCS_PER_BATCH = 64  # reference BATCH_SIZE=64 (config.py:44-47)


def get_spark(
    app_name: str = "gonova-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    configs: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("GONOVA_MASTER", "local[*]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_DOCS_PER_BATCH)
        )
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("GONOVA_DRIVER_MEM", "8g"))
    )
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (configs or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
