"""Persistent-metastore bucketed staging across real JVM boundaries
(VERDICT r4 #8; scripts/metastore_demo.py).

``spark.sql.catalogImplementation`` is a static conf — one value per JVM
— so each session here is a genuine subprocess, not a fixture: session 1
stages the bucketed corpus table into a Derby-backed Hive metastore and
runs the checkpointed extraction; the test then simulates a crash
(drops half the checkpoint rows + their output dirs — the same damage
as test_resume_after_simulated_crash); session 2 must find the table in
the catalog WITHOUT restaging, keep SelectedBucketsCount pruning, and
complete exactly the missing partitions.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pyspark.sql.functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PARTS = 8  # must match scripts/metastore_demo.py


def _run(mode: str, workdir: str, corpus: str, out: str, ckpt: str) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO, GONOVA_MASTER="local[4]")
    p = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "metastore_demo.py"),
            mode,
            workdir,
            corpus,
            out,
            ckpt,
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=workdir,  # derby.log etc. stay out of the repo
        timeout=600,
    )
    assert p.returncode == 0, f"{mode} failed:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}"
    return json.loads(p.stdout.strip().splitlines()[-1])


def test_metastore_remembers_staged_table_across_sessions(spark, tmp_path):
    from gonova_document_parser_spark.corpus import generate_pages

    workdir = str(tmp_path / "ms")
    os.makedirs(workdir)
    corpus = str(tmp_path / "corpus")
    generate_pages(spark, 160, num_partitions=4).write.parquet(corpus)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    s1 = _run("stage", workdir, corpus, out, ckpt)
    assert s1["table_existed_at_start"] is False
    assert s1["selected_buckets"] <= 2 and s1["total_buckets"] == N_PARTS
    assert s1["n_docs"] == 160 and s1["partitions_done_before"] == 0

    # simulated crash: lose partitions >= 4 (ckpt rows + output dirs)
    kept = spark.read.parquet(ckpt).where(F.col("partition_id") < 4)
    ckpt2 = str(tmp_path / "ckpt2")
    kept.write.parquet(ckpt2)
    for pid in range(4, N_PARTS):
        p = f"{out}/partition_id={pid}"
        if os.path.exists(p):
            shutil.rmtree(p)

    s2 = _run("resume", workdir, corpus, out, ckpt2)
    # the catalog REMEMBERED the table; the resume arm never stages
    assert s2["table_existed_at_start"] is True
    # pruning still compiles in the fresh session
    assert s2["selected_buckets"] <= 2 and s2["total_buckets"] == N_PARTS
    # exactly the crash-surviving partitions were skipped
    assert s2["partitions_done_before"] == 4
    # restage witness: every staged data file byte-identical across runs
    assert s2["table_files"] == s1["table_files"]

    result = spark.read.parquet(out)
    assert result.count() == 160
    assert result.select("url").distinct().count() == 160