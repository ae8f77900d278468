"""Checkpoint/lineage/resume fixtures (FIXTURES.md §3 resume contract).

A real kill -9 mid-run is exercised by the verify drive (see
.claude/skills/verify/SKILL.md); here the crash window is simulated by
erasing half the checkpoint rows + their output dirs, then asserting the
re-run restores exactly the missing partitions (no dup/missing urls).
"""

import shutil

import pyspark.sql.functions as F
import pytest

from gonova_document_parser_spark.checkpoint import (
    completed_partitions,
    run_with_checkpoint,
)
from gonova_document_parser_spark.corpus import generate_pages

N_DOCS = 300
N_PARTS = 8


@pytest.fixture()
def paths(tmp_path):
    return str(tmp_path / "out"), str(tmp_path / "ckpt")


def test_full_run_then_noop(spark, paths):
    out, ckpt = paths
    pages = generate_pages(spark, N_DOCS, num_partitions=4)
    s1 = run_with_checkpoint(
        spark, pages, out, ckpt, run_id="r1", n_partitions=N_PARTS, n_waves=4
    )
    assert s1["partitions_done_before"] == 0
    assert s1["partitions_total"] == N_PARTS
    assert s1["n_docs"] == N_DOCS
    result = spark.read.parquet(out)
    assert result.count() == N_DOCS
    assert result.select("url").distinct().count() == N_DOCS

    s2 = run_with_checkpoint(
        spark, pages, out, ckpt, run_id="r1", n_partitions=N_PARTS, n_waves=4
    )
    assert s2["partitions_done_before"] == N_PARTS  # no-op rerun
    assert spark.read.parquet(out).count() == N_DOCS


def test_resume_after_simulated_crash(spark, paths, tmp_path):
    out, ckpt = paths
    pages = generate_pages(spark, N_DOCS, num_partitions=4)
    run_with_checkpoint(
        spark, pages, out, ckpt, run_id="r1", n_partitions=N_PARTS, n_waves=4
    )

    # simulate a crash that lost partitions >= 4: drop their ckpt rows + data
    kept = spark.read.parquet(ckpt).where(F.col("partition_id") < 4)
    ckpt2 = str(tmp_path / "ckpt2")
    kept.write.parquet(ckpt2)
    for pid in range(4, N_PARTS):
        shutil.rmtree(f"{out}/partition_id={pid}")

    s = run_with_checkpoint(
        spark, pages, out, ckpt2, run_id="r1", n_partitions=N_PARTS, n_waves=4
    )
    assert s["partitions_done_before"] == 4
    assert s["partitions_total"] == N_PARTS
    result = spark.read.parquet(out)
    assert result.count() == N_DOCS
    assert result.select("url").distinct().count() == N_DOCS

    # lineage: every partition has exactly one completed checkpoint row
    rows = (
        spark.read.parquet(ckpt2)
        .where(F.col("status") == "completed")
        .groupBy("partition_id")
        .count()
        .collect()
    )
    assert len(rows) == N_PARTS
    assert all(r["count"] == 1 for r in rows)


def test_incremental_processes_only_new_urls(spark, paths):
    from gonova_document_parser_spark.checkpoint import run_incremental

    out, ckpt = paths
    first = generate_pages(spark, 200, num_partitions=2)
    s1 = run_incremental(spark, first, out, ckpt, n_partitions=4, n_waves=2)
    assert s1["n_new"] == 200
    assert spark.read.parquet(out).count() == 200

    grown = generate_pages(spark, 300, num_partitions=2)  # 100 appended
    s2 = run_incremental(spark, grown, out, ckpt, n_partitions=4, n_waves=2)
    assert s2["n_new"] == 100  # only the delta was extracted
    result = spark.read.parquet(out)
    assert result.count() == 300
    assert result.select("url").distinct().count() == 300

    s3 = run_incremental(spark, grown, out, ckpt, n_partitions=4, n_waves=2)
    assert s3["n_new"] == 0  # steady state: no-op
    assert spark.read.parquet(out).count() == 300


def test_partition_id_is_stable_function_of_url(spark):
    pages = generate_pages(spark, 50, num_partitions=2)
    from gonova_document_parser_spark.checkpoint import partitioned

    a = {r["url"]: r["partition_id"] for r in partitioned(pages, 16).collect()}
    b = {
        r["url"]: r["partition_id"]
        for r in partitioned(pages.repartition(7), 16).collect()
    }
    assert a == b


def test_completed_partitions_empty_when_no_table(spark, tmp_path):
    df = completed_partitions(spark, str(tmp_path / "nope"), "r1", "")
    assert df.count() == 0


def test_zero_doc_partitions_get_checkpoint_rows(spark, paths):
    """ADVICE r1: partitions with no documents must still emit a 'completed'
    checkpoint row, else resume re-runs them forever and the summary
    undercounts partitions_total."""
    out, ckpt = paths
    # 5 docs into 32 partitions -> most partitions are empty
    pages = generate_pages(spark, 5, num_partitions=2)
    s1 = run_with_checkpoint(
        spark, pages, out, ckpt, run_id="rz", n_partitions=32, n_waves=2
    )
    assert s1["partitions_total"] == 32
    assert s1["n_docs"] == 5
    ck = spark.read.parquet(ckpt)
    assert ck.where(F.col("status") == "completed").count() == 32
    assert ck.where(F.col("n_docs") == 0).count() == 32 - ck.where(
        F.col("n_docs") > 0
    ).count()
    # second invocation is a true no-op: every partition already done
    s2 = run_with_checkpoint(
        spark, pages, out, ckpt, run_id="rz", n_partitions=32, n_waves=2
    )
    assert s2["partitions_done_before"] == 32


def test_verify_readback_mode(spark, paths):
    """Audit mode re-reads the written wave and must agree with the observed
    metrics (raises on mismatch)."""
    out, ckpt = paths
    pages = generate_pages(spark, 60, num_partitions=2)
    s = run_with_checkpoint(
        spark, pages, out, ckpt, run_id="rv", n_partitions=4, n_waves=2,
        verify_readback=True,
    )
    assert s["n_docs"] == 60
    assert s["n_ok"] + s["n_err"] == 60


def test_per_wave_progress_hook(spark, paths):
    """Q5 live progress: one callback per committed wave with cumulative
    partition counts and per-wave doc totals."""
    out, ckpt = paths
    pages = generate_pages(spark, 80, num_partitions=2)
    seen = []
    s = run_with_checkpoint(
        spark, pages, out, ckpt, run_id="rp", n_partitions=8, n_waves=4,
        on_progress=seen.append,
    )
    assert [p["wave"] for p in seen] == [1, 2, 3, 4]
    assert all(p["partitions_total"] == 8 for p in seen)
    assert [p["partitions_done"] for p in seen] == [2, 4, 6, 8]
    assert sum(p["n_docs"] for p in seen) == 80 == s["n_docs"]
    assert all(p["docs_per_sec"] > 0 for p in seen)


def test_incremental_digest_table_mode(spark, paths):
    """Digest-table incremental: second run's anti-join reads the 16-byte
    md5 _url_digests sidecar (never rescans the text-heavy output) and
    still extracts exactly the delta, exactly once."""
    import os

    from gonova_document_parser_spark.checkpoint import run_incremental

    out, ckpt = paths
    first = generate_pages(spark, 50, num_partitions=2)
    s1 = run_incremental(
        spark, first, out, ckpt, n_partitions=4, n_waves=2, use_digest_table=True
    )
    assert s1["n_new"] == 50
    assert os.path.isdir(f"{out}/_url_digests")
    # digest sidecar is invisible to whole-output reads (underscore dir)
    assert spark.read.parquet(out).count() == 50

    grown = generate_pages(spark, 80, num_partitions=2)  # 50 old + 30 new
    s2 = run_incremental(
        spark, grown, out, ckpt, n_partitions=4, n_waves=2, use_digest_table=True
    )
    assert s2["n_new"] == 30
    result = spark.read.parquet(out)
    assert result.count() == 80
    assert result.select("url").distinct().count() == 80
    # third run: nothing new
    s3 = run_incremental(
        spark, grown, out, ckpt, n_partitions=4, n_waves=2, use_digest_table=True
    )
    assert s3["n_new"] == 0 and spark.read.parquet(out).count() == 80
    # 128-bit digests (md5 -> 16-byte binary), one per output url
    dig = spark.read.parquet(f"{out}/_url_digests")
    assert dict(dig.dtypes)["url_digest"] == "binary"
    assert dig.select(F.length("url_digest")).distinct().collect()[0][0] == 16
    assert dig.select("url_digest").distinct().count() == 80


def test_digest_mode_grown_input_after_midrun_crash(spark, paths, tmp_path):
    """ADVICE r2 crash window: digests now commit PER WAVE (data -> digests
    -> checkpoint row), so even when the crawl input GROWS between a
    mid-run crash and the retry (new snapshot id), already-committed urls
    anti-join out via their digests and are never re-extracted into the
    new delta."""
    import glob

    from gonova_document_parser_spark.checkpoint import run_incremental

    out, ckpt = paths
    first = generate_pages(spark, 60, num_partitions=2)
    s1 = run_incremental(
        spark, first, out, ckpt, n_partitions=4, n_waves=2, use_digest_table=True
    )
    snap = s1["run_id"]
    # simulate dying after wave 1 of 2: partitions 2,3 lose their data,
    # digests AND checkpoint rows (per-wave commit order means a real kill
    # can only lose suffixes of that order)
    kept = spark.read.parquet(ckpt).where(F.col("partition_id") < 2)
    ckpt2 = str(tmp_path / "ckpt2")
    kept.write.parquet(ckpt2)
    for pid in (2, 3):
        for p in glob.glob(f"{out}/delta={snap}/partition_id={pid}") + glob.glob(
            f"{out}/_url_digests/delta={snap}/partition_id={pid}"
        ):
            shutil.rmtree(p)

    grown = generate_pages(spark, 90, num_partitions=2)  # crawl grew mid-crash
    run_incremental(
        spark, grown, out, ckpt2, n_partitions=4, n_waves=2, use_digest_table=True
    )
    result = spark.read.parquet(out)
    assert result.select("url").distinct().count() == 90
    assert result.count() == 90  # committed urls were NOT extracted twice
    dig = spark.read.parquet(f"{out}/_url_digests")
    assert dig.select("url_digest").distinct().count() == 90


def test_digest_mode_data_committed_digests_lost_crash(spark, paths, tmp_path):
    """ADVICE r3 residual window: a kill BETWEEN a wave's data commit and
    its digest commit leaves extracted rows under delta=S1 with no
    digests.  With a grown input, the retry computes a new snapshot and
    would re-extract those urls under delta=S2 while the orphaned
    delta=S1 dirs remain — duplicate urls in whole-output reads.
    reconcile_orphan_partitions removes the orphan dirs first, so every
    url appears exactly once."""
    import glob

    from gonova_document_parser_spark.checkpoint import run_incremental

    out, ckpt = paths
    first = generate_pages(spark, 60, num_partitions=2)
    s1 = run_incremental(
        spark, first, out, ckpt, n_partitions=4, n_waves=2, use_digest_table=True
    )
    snap = s1["run_id"]
    # simulate dying between wave 2's data write and its digest write:
    # partitions 2,3 KEEP their data but lose digests + checkpoint rows
    # (the harder suffix of the data -> digests -> ckpt commit order)
    kept = spark.read.parquet(ckpt).where(F.col("partition_id") < 2)
    ckpt2 = str(tmp_path / "ckpt2")
    kept.write.parquet(ckpt2)
    for pid in (2, 3):
        for p in glob.glob(f"{out}/_url_digests/delta={snap}/partition_id={pid}"):
            shutil.rmtree(p)
    # orphaned data rows exist right now
    assert spark.read.parquet(out).count() == 60

    grown = generate_pages(spark, 90, num_partitions=2)  # crawl grew mid-crash
    run_incremental(
        spark, grown, out, ckpt2, n_partitions=4, n_waves=2, use_digest_table=True
    )
    result = spark.read.parquet(out)
    assert result.select("url").distinct().count() == 90
    assert result.count() == 90  # orphans reconciled away, no duplicates
    dig = spark.read.parquet(f"{out}/_url_digests")
    assert dig.select("url_digest").distinct().count() == 90
    # invariant restored: every surviving partition dir has a completed row
    import os

    ck = spark.read.parquet(ckpt2).where(F.col("status") == "completed")
    have_rows = {(r["run_id"], r["partition_id"]) for r in ck.collect()}
    for delta_dir in glob.glob(f"{out}/delta=*"):
        rid = os.path.basename(delta_dir).split("=", 1)[1]
        for pdir in glob.glob(f"{delta_dir}/partition_id=*"):
            pid = int(os.path.basename(pdir).split("=", 1)[1])
            assert (rid, pid) in have_rows


def test_reconcile_noop_on_healthy_output(spark, paths):
    """reconcile must not touch a healthy incremental output."""
    from gonova_document_parser_spark.checkpoint import (
        reconcile_orphan_partitions,
        run_incremental,
    )

    out, ckpt = paths
    pages = generate_pages(spark, 40, num_partitions=2)
    run_incremental(
        spark, pages, out, ckpt, n_partitions=4, n_waves=2, use_digest_table=True
    )
    assert reconcile_orphan_partitions(spark, out, ckpt) == 0
    assert spark.read.parquet(out).count() == 40
    assert spark.read.parquet(f"{out}/_url_digests").count() == 40


def test_bucketed_table_wave_pruning(spark, paths):
    """BENCH §1b production shape (VERDICT r3 #8): the corpus written ONCE
    as a managed table bucketed on partition_id makes each wave's
    partition_id IN (...) filter compile to bucket pruning — the scan
    reads only the wave's buckets, no --stage-source copy — and the
    checkpointed run off the table is url/text-identical to the plain
    parquet run."""
    import re

    from gonova_document_parser_spark.checkpoint import stage_bucketed_table

    out, ckpt = paths
    pages = generate_pages(spark, 200, num_partitions=4)
    t = stage_bucketed_table(spark, pages, "corpus_bucketed_test", N_PARTS)
    try:
        # plan assertion: a 2-partition wave filter reads 2 of N buckets —
        # including the EXACT shape run_with_checkpoint builds (bytes_in
        # added, partition_id kept as the STORED column; recomputing it
        # via withColumn would silently disable pruning)
        wave = t.where(F.col("partition_id").isin([1, 5])).withColumn(
            "bytes_in", F.octet_length("html").cast("long")
        )
        plan = wave._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m, f"no bucket pruning in plan:\n{plan[:800]}"
        assert int(m.group(1)) <= 2 and int(m.group(2)) == N_PARTS

        s = run_with_checkpoint(
            spark, t, out, ckpt, run_id="rb", n_partitions=N_PARTS, n_waves=4
        )
        assert s["n_docs"] == 200
        got = {
            (r["url"], r["extracted_text"])
            for r in spark.read.parquet(out).collect()
        }
        from gonova_document_parser_spark.operators.extract import extract_pages

        want = {
            (r["url"], r["extracted_text"])
            for r in extract_pages(pages).collect()
        }
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS corpus_bucketed_test")
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
        )


def test_read_fallback_scoped_to_missing_path(spark, paths):
    """ADVICE r2: only a MISSING output/digest path means 'first run'.  An
    existing-but-unreadable path (here: a dir with no parquet) re-raises
    instead of silently reprocessing the entire input into duplicates."""
    import os

    from gonova_document_parser_spark.checkpoint import run_incremental

    out, ckpt = paths
    os.makedirs(out)  # exists, but holds no readable parquet
    pages = generate_pages(spark, 10, num_partitions=1)
    with pytest.raises(Exception, match="UNABLE_TO_INFER_SCHEMA|Unable to infer"):
        run_incremental(spark, pages, out, ckpt, n_partitions=2, n_waves=1)


def test_stage_source_run_and_resume(spark, paths, tmp_path):
    """stage_source=True: waves run off a partition_id-partitioned staging
    copy (file-pruned scans), byte-identical output, and resume restages
    only the todo partitions."""
    out, ckpt = paths
    pages = generate_pages(spark, N_DOCS, num_partitions=4)
    s1 = run_with_checkpoint(
        spark, pages, out, ckpt, run_id="rs", n_partitions=N_PARTS, n_waves=4,
        stage_source=True,
    )
    assert s1["n_docs"] == N_DOCS
    import os

    staged = f"{out}/_staged_source"
    assert len([d for d in os.listdir(staged) if d.startswith("partition_id=")]) == N_PARTS
    result = spark.read.parquet(out)
    assert result.count() == N_DOCS
    assert result.select("url").distinct().count() == N_DOCS

    # crash simulation: lose partitions >= 4; resume restages ONLY those
    kept = spark.read.parquet(ckpt).where(F.col("partition_id") < 4)
    ckpt2 = str(tmp_path / "ckpt2")
    kept.write.parquet(ckpt2)
    for pid in range(4, N_PARTS):
        shutil.rmtree(f"{out}/partition_id={pid}")
    s2 = run_with_checkpoint(
        spark, pages, out, ckpt2, run_id="rs", n_partitions=N_PARTS, n_waves=4,
        stage_source=True,
    )
    assert s2["partitions_done_before"] == 4
    result = spark.read.parquet(out)
    assert result.count() == N_DOCS
    assert result.select("url").distinct().count() == N_DOCS
