"""Corpus sources/sinks (SURVEY §2.1 S1/S2, K1/K3).

The reference ingests documents one HTTP upload at a time
(``api.py:588-634``) or via a directory glob (``cli.py:310-312``); both
collapse into table scans here.  The pages table is Iceberg-shaped
(``input_hint``): reads go through ``spark.read.table`` when a catalog name
is given, else straight parquet — the engine code is identical either way
because everything downstream is DataFrame-typed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_pages(spark: SparkSession, source: str) -> DataFrame:
    """Read the pages corpus from an Iceberg/catalog table name or a path.

    ``source`` containing a '/' is treated as a parquet path, anything else
    as a catalog table.  Column pruning + predicate pushdown are Catalyst's
    job; we only fix the column contract.
    """
    if "/" in source:
        df = spark.read.parquet(source)
    else:
        df = spark.read.table(source)
    return df.select(*[c for c in PAGES_COLUMNS if c in df.columns])


def write_pages(df: DataFrame, target: str, mode: str = "overwrite") -> None:
    """Write a pages corpus (catalog table name or parquet path).

    Catalog writes go through the V2 ``writeTo`` API (what an Iceberg
    catalog implements); the built-in V1 session catalog doesn't support
    replace-table-as-select, so fall back to ``saveAsTable`` there.
    """
    if "/" in target:
        df.write.mode(mode).parquet(target)
        return
    try:
        df.writeTo(target).createOrReplace()
    except Exception:  # V1 session catalog: no RTAS support
        df.write.mode(mode).saveAsTable(target)


def read_raw_files(spark: SparkSession, path: str, pattern: str = "*") -> DataFrame:
    """Directory-of-files source (S2): binaryFile -> pages-shaped frame.

    Replaces ``cli.py:310-312`` / ``scripts/batch_process.py:178-180`` glob
    batching: each file becomes one row (url=file path, html=content).
    """
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(path)
    )
    return df.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit("").alias("text"),
        F.lit("und").alias("lang"),
    )
