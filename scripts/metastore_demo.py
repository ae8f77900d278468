"""Two-JVM persistent-metastore demo for bucketed staging (VERDICT r4 #8).

The local in-memory catalog forgets the bucketed corpus table between
sessions, forcing a restage on every resume (documented caveat in
``stage_bucketed_table``).  With a Derby-backed embedded Hive metastore
— the local stand-in for the production Iceberg/Glue catalog — the
table's METADATA persists too, so a resumed session reuses the staged
files untouched and bucket pruning still compiles.

Driven twice by tests/test_metastore_resume.py (one process per mode —
``spark.sql.catalogImplementation`` is a static conf, one value per JVM):

  python scripts/metastore_demo.py stage  <workdir> <corpus_parquet> \
      <out> <ckpt>        # stage the bucketed table + full checkpointed run
  python scripts/metastore_demo.py resume <workdir> <corpus_parquet> \
      <out> <ckpt>        # NO staging call: reuse the remembered table,
                          # assert pruning, re-drive the checkpointed run

Each mode prints one JSON line: catalog view, SelectedBucketsCount from
the wave-filter plan, run summary, and a (name, size) listing of the
staged table's data files — the restage witness (identical across modes
= the resume reused every staged byte).

Production equivalent: an Iceberg catalog with
``writeTo(t).partitionedBy(bucket(N, url))`` — the metastore here plays
the catalog's role; nothing else changes.
"""

from __future__ import annotations

import json
import os
import re
import sys

TABLE = "corpus_bucketed_demo"
N_PARTS = 8


def _session(workdir: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.appName("gonova-metastore-demo")
        .master(os.environ.get("GONOVA_MASTER", "local[4]"))
        .config("spark.sql.warehouse.dir", f"{workdir}/warehouse")
        .config("spark.sql.catalogImplementation", "hive")
        .config(
            "spark.hadoop.javax.jdo.option.ConnectionURL",
            f"jdbc:derby:;databaseName={workdir}/metastore_db;create=true",
        )
        .config("spark.driver.extraJavaOptions", f"-Dderby.system.home={workdir}")
        # pruning must survive the session boundary: the conf rides the
        # SESSION config (stage_bucketed_table sets it for its own session;
        # a resumed session never calls the stager, so it pins it here)
        .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .enableHiveSupport()
        .getOrCreate()
    )


def _table_files(workdir: str) -> list[tuple[str, int]]:
    d = f"{workdir}/warehouse/{TABLE}"
    return sorted(
        (f, os.path.getsize(os.path.join(d, f)))
        for f in os.listdir(d)
        if not f.startswith("_") and not f.startswith(".")
    )


def main(argv: list[str]) -> None:
    from pyspark.sql import functions as F

    from gonova_document_parser_spark.checkpoint import (
        run_with_checkpoint,
        stage_bucketed_table,
    )

    mode, workdir, corpus, out, ckpt = argv[:5]
    spark = _session(workdir)
    spark.sparkContext.setLogLevel("ERROR")
    existed = spark.catalog.tableExists(TABLE)
    if mode == "stage":
        t = stage_bucketed_table(
            spark, spark.read.parquet(corpus), TABLE, N_PARTS
        )
    else:
        assert existed, "resume mode found no remembered table — metastore lost"
        t = spark.table(TABLE)  # reuse: no staging write anywhere in this arm
    # the EXACT wave shape run_with_checkpoint scans — pruning must hold
    wave = t.where(F.col("partition_id").isin([1, 5])).withColumn(
        "bytes_in", F.octet_length("html").cast("long")
    )
    plan = wave._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    s = run_with_checkpoint(
        spark, t, out, ckpt, run_id="ms-demo", n_partitions=N_PARTS, n_waves=4
    )
    print(
        json.dumps(
            {
                "mode": mode,
                "table_existed_at_start": existed,
                "selected_buckets": int(m.group(1)) if m else None,
                "total_buckets": int(m.group(2)) if m else None,
                "partitions_done_before": s["partitions_done_before"],
                "n_docs": s["n_docs"],
                "table_files": _table_files(workdir),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
