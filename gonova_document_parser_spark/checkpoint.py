"""Checkpoint / resume / per-partition lineage+metrics (SURVEY §7.4).

Replaces the reference's Redis job-state machine (``job_manager.py:62-177``,
``queue.py:113-198``: queued -> processing -> completed/failed) with two
idempotent table writes:

  1. extracted rows, written parquet ``partitionBy(partition_id)`` under
     dynamic partition-overwrite — re-running a partition atomically
     replaces its directory, so a killed run never leaves duplicates;
  2. a checkpoint/metrics row per completed partition
     ``(run_id, partition_id, status, n_docs, n_ok, n_err, bytes_in,
     started_at, finished_at, input_snapshot)`` — the lineage record the
     reference kept per job (``queue.py:36-53``), now per partition.

Resume = broadcast anti-join of the corpus against completed partition ids:
only unfinished partitions are re-read and re-extracted.  Crash windows:
die during (1) -> no checkpoint row, partition re-runs, overwrite is
idempotent; die between (1) and (2) -> same.  Exactly-once output, no
coordination service.

``partition_id = pmod(xxhash64(url), n_partitions)`` is a pure function of
the row, so lineage is stable across cluster sizes and retries (the same
document always lands in the same partition).
"""

from __future__ import annotations

import datetime
import logging
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.extract import extract_pages

_LOG = logging.getLogger("gonova.checkpoint")

CHECKPOINT_SCHEMA = (
    "run_id string, partition_id int, status string, n_docs long, n_ok long, "
    "n_err long, bytes_in long, started_at timestamp, finished_at timestamp, "
    "input_snapshot string"
)


def partitioned(pages: DataFrame, n_partitions: int) -> DataFrame:
    return pages.withColumn(
        "partition_id",
        F.pmod(F.xxhash64("url"), F.lit(n_partitions)).cast("int"),
    )


def url_digest_expr(col: str = "url") -> F.Column:
    """128-bit content key for the seen-url sidecar: ``unhex(md5(url))``.

    16 bytes/url keeps the sidecar tiny while making birthday collisions
    statistically impossible at any corpus size (2^64 urls for a 50% chance
    of ONE collision) — a 64-bit key would silently drop colliding new urls
    at the 10^12-row scale this mode targets (ADVICE r2)."""
    return F.unhex(F.md5(col))


def _read_parquet_if_exists(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame | None:
    """Read ``path`` or return None ONLY if the path does not exist.

    Any other read failure (permissions, corrupt footer, transient FS
    error) re-raises: treating those as "first run" would silently
    reprocess the whole input and duplicate output rows (ADVICE r2)."""
    from pyspark.errors import AnalysisException

    reader = spark.read.schema(schema) if schema else spark.read
    try:
        return reader.parquet(path)
    except AnalysisException as e:
        msg = str(e)
        if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
            return None
        raise


def completed_partitions(
    spark: SparkSession, checkpoint_path: str, run_id: str, input_snapshot: str
) -> DataFrame:
    """Distinct partition_ids already completed for this (run, snapshot)."""
    ckpt = _read_parquet_if_exists(spark, checkpoint_path, CHECKPOINT_SCHEMA)
    if ckpt is None:  # first run: no checkpoint table yet
        return spark.createDataFrame([], "partition_id int")
    return (
        ckpt.where(
            (F.col("run_id") == run_id)
            & (F.col("status") == "completed")
            & (F.col("input_snapshot") == input_snapshot)
        )
        .select("partition_id")
        .distinct()
    )


def _now() -> datetime.datetime:
    return datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)


def reconcile_orphan_partitions(
    spark: SparkSession, output_path: str, checkpoint_path: str
) -> int:
    """Delete delta partition dirs that lack a completed checkpoint row.

    Closes the digest-mode crash window (ADVICE r3): the per-wave commit
    order is data -> digests -> checkpoint row, so a kill between a
    wave's data write and its digest write leaves extracted rows under
    ``delta=S1`` with NO digests.  If the crawl input grows before the
    retry, the digest anti-join treats those urls as new, the delta's
    content snapshot changes to S2, and the urls are re-extracted under
    ``delta=S2`` — while the orphaned ``delta=S1`` dirs remain, so
    whole-output reads would return them twice.  Reconciling first
    restores the invariant "every surviving partition dir has a
    completed checkpoint row (and therefore its digests)"; the orphaned
    urls simply rejoin the new delta.

    Safe on every layout: only ``delta=*/partition_id=*`` dirs are
    touched (the incremental layout; direct ``run_with_checkpoint``
    outputs have no delta level and resume through the checkpoint table
    alone, where in-place wave overwrite is already idempotent).  Uses
    the Hadoop FileSystem API, so it works on HDFS/S3A as well as
    local paths.  Driver-side state is one (run_id, partition_id) pair
    per completed partition — bounded by deltas x n_partitions, the
    same order as the checkpoint table itself.

    Returns the number of partition dirs removed.
    """
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(output_path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return 0
    ckpt = _read_parquet_if_exists(spark, checkpoint_path, CHECKPOINT_SCHEMA)
    completed: set[tuple[str, int]] = set()
    if ckpt is not None:
        completed = {
            (r["run_id"], r["partition_id"])
            for r in ckpt.where(F.col("status") == "completed")
            .select("run_id", "partition_id")
            .distinct()
            .collect()
        }
    removed = 0
    digest_root = jvm.org.apache.hadoop.fs.Path(f"{output_path}/_url_digests")
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("delta=")):
            continue
        run_id = name[len("delta=") :]
        for pst in fs.listStatus(st.getPath()):
            pname = pst.getPath().getName()
            if not (pst.isDirectory() and pname.startswith("partition_id=")):
                continue
            try:
                pid = int(pname.split("=", 1)[1])
            except ValueError:
                continue
            if (run_id, pid) in completed:
                continue
            fs.delete(pst.getPath(), True)
            dig = jvm.org.apache.hadoop.fs.Path(
                f"{output_path}/_url_digests/{name}/{pname}"
            )
            if fs.exists(dig):
                fs.delete(dig, True)
            removed += 1
            _LOG.warning(
                "reconcile: removed orphan partition dir %s/%s "
                "(no completed checkpoint row)", name, pname,
            )
    # digest dirs can also outlive their data (kill during a re-run's data
    # overwrite after digests existed): drop digest partitions with no
    # completed row too, so the anti-join can't hide urls whose data is gone
    if fs.exists(digest_root):
        for st in fs.listStatus(digest_root):
            name = st.getPath().getName()
            if not (st.isDirectory() and name.startswith("delta=")):
                continue
            run_id = name[len("delta=") :]
            for pst in fs.listStatus(st.getPath()):
                pname = pst.getPath().getName()
                if not (pst.isDirectory() and pname.startswith("partition_id=")):
                    continue
                try:
                    pid = int(pname.split("=", 1)[1])
                except ValueError:
                    continue
                if (run_id, pid) not in completed:
                    fs.delete(pst.getPath(), True)
                    removed += 1
                    _LOG.warning(
                        "reconcile: removed orphan digest dir %s/%s", name, pname
                    )
    if removed:
        # drop now-dataless delta dirs (only _SUCCESS/hidden markers left):
        # an all-dirs-no-files tree would fail parquet schema inference on
        # the next read (which is deliberately NOT treated as "first run" —
        # see _read_parquet_if_exists)
        def _dataless(p):
            return all(
                s.getPath().getName().startswith(("_", "."))
                for s in fs.listStatus(p)
            )

        for parent in (digest_root, root):
            if not fs.exists(parent):
                continue
            for st in fs.listStatus(parent):
                if (
                    st.isDirectory()
                    and st.getPath().getName().startswith("delta=")
                    and _dataless(st.getPath())
                ):
                    fs.delete(st.getPath(), True)
            if parent is digest_root and len(fs.listStatus(parent)) == 0:
                fs.delete(parent, True)
    return removed


def run_incremental(
    spark: SparkSession,
    pages: DataFrame,
    output_path: str,
    checkpoint_path: str,
    n_partitions: int = 64,
    n_waves: int = 4,
    use_digest_table: bool = False,
) -> dict:
    """Process only urls not yet present in the output (growing corpus).

    The crawl-append mode SURVEY §2.2 calls "incremental re-runs via
    checkpoint anti-join": each invocation extracts the delta and commits
    it under a snapshot-derived run_id, so within one delta the wave-level
    kill/resume semantics of ``run_with_checkpoint`` still apply.

    Scale: the anti-join keys on url only (both sides pruned to one
    column) and Spark's runtime bloom-filter join (session default: on)
    prunes the shuffle.  ``use_digest_table=True`` goes further: the seen
    set is a 16-byte-per-url (md5) ``_url_digests`` sidecar, so incremental
    runs never rescan the (text-heavy) output at all — the anti-join reads
    digests only.  Digests commit PER WAVE inside ``run_with_checkpoint``,
    ordered data -> digests -> checkpoint rows, all idempotent dynamic
    partition overwrites: a partition marked completed always has its
    digests, so even if the crawl input GROWS between a crash and the
    retry (new snapshot id), committed urls anti-join out and are never
    re-extracted into the new delta (ADVICE r2).  Before the anti-join,
    ``reconcile_orphan_partitions`` removes any partition dir whose wave
    died between its data commit and its checkpoint row (data present,
    digests and/or checkpoint row lost): those urls rejoin the delta and
    extract exactly once — without reconcile a grown input would compute
    a new snapshot and re-extract them beside the orphaned copy
    (ADVICE r3).
    """
    digest_path = f"{output_path}/_url_digests"
    if use_digest_table:
        reconcile_orphan_partitions(spark, output_path, checkpoint_path)
        seen_keys = _read_parquet_if_exists(spark, digest_path)
        if seen_keys is None:  # first run: no digests yet
            new_pages = pages
        else:
            new_pages = pages.join(
                seen_keys.select("url_digest"),
                url_digest_expr(pages["url"]) == seen_keys["url_digest"],
                "left_anti",
            )
    else:
        seen = _read_parquet_if_exists(spark, output_path)
        new_pages = (
            pages if seen is None else pages.join(seen.select("url"), "url", "left_anti")
        )

    # snapshot id from the delta's content: stable across retries of the
    # same delta, different for a different delta
    # bit_xor: associative, commutative, overflow-free -> order-independent
    # content digest of the delta's url set
    agg = new_pages.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("url")), F.lit(0)).alias("h"),
    ).collect()[0]
    if agg["n"] == 0:
        return {"run_id": None, "n_new": 0}
    snap = f"delta-{agg['n']}-{agg['h'] & 0xFFFFFFFFFFFF:x}"
    # each delta gets its own partition directory: the wave-level dynamic
    # partition overwrite then only ever replaces dirs of THIS delta —
    # prior deltas' data can't be clobbered, and whole-output reads pick
    # up `delta` as a discovered partition column
    summary = run_with_checkpoint(
        spark,
        new_pages,
        output_path=f"{output_path}/delta={snap}",
        checkpoint_path=checkpoint_path,
        run_id=snap,
        n_partitions=n_partitions,
        input_snapshot=snap,
        n_waves=n_waves,
        digest_path=f"{digest_path}/delta={snap}" if use_digest_table else None,
    )
    summary["n_new"] = agg["n"]
    return summary


def stage_bucketed_table(
    spark: SparkSession, pages: DataFrame, table: str, n_partitions: int
) -> DataFrame:
    """Write the corpus ONCE as a managed table bucketed on partition_id —
    the production shape that makes wave scans prune with NO per-run
    staging copy (BENCH §1b; the Iceberg ``bucket(N, url)`` analog,
    expressed through the local catalog's Hive-style bucketing since the
    built-in session catalog rejects DSv2 bucket transforms).

    ``partition_id = pmod(xxhash64(url), n_partitions)`` is precomputed
    into the table, and the table is bucketed AND sorted by it: a wave's
    ``partition_id IN (...)`` filter then compiles to bucket pruning —
    the scan's ``SelectedBucketsCount`` drops to at most the wave's
    partition count, so every wave reads ~wave_size/n_partitions of the
    corpus instead of all of it, turning n_waves x corpus total scan
    volume into ~1 x corpus with zero extra copies on any re-run or
    resume (the table persists; ``--stage-source`` rewrites per run).

    Returns the table as a DataFrame ready for ``run_with_checkpoint``
    (its rows already carry partition_id; ``partitioned`` recomputes the
    same value idempotently since it's a pure function of url).

    Local-mode caveat: the default in-memory catalog forgets table
    METADATA across sessions while the warehouse files persist, so a
    fresh session must restage (or run with a persistent metastore /
    Iceberg catalog in production — where this helper is one
    ``writeTo(table).partitionedBy(bucket(N, url))``).  Orphaned
    locations from a previous session are cleaned up first.  The
    persistent-catalog path is demonstrated end-to-end by
    scripts/metastore_demo.py + tests/test_metastore_resume.py: a
    Derby-backed Hive metastore carries the table across real JVM
    boundaries — the resumed session restages nothing and pruning still
    compiles (it pins autoBucketedScan.enabled=false in its OWN session
    conf, since this function isn't called on that path).
    """
    # force bucketed scans: the planner's DisableUnnecessaryBucketedScan
    # turns bucketed reading (and with it bucket PRUNING) off when no
    # join/agg wants the distribution — but pruning is exactly why the
    # table is bucketed here.  The conf change is DELIBERATELY session-
    # scoped, not restored: every later scan of the staged table (each
    # checkpoint wave, a resumed session's re-drive) must keep pruning,
    # so a scoped save/restore here would silently re-enable the
    # optimization between waves and defeat the table's purpose.
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # in-memory catalog + surviving warehouse dir -> LOCATION_ALREADY_EXISTS.
    # The managed-table layout is warehouse/<tbl> for the default database
    # and warehouse/<db>.db/<tbl> otherwise — a bare + f"/{table}" misses
    # qualified names (db.tbl is NOT a directory called "db.tbl"), leaving
    # the orphan in place and the DROP+save to fail.
    parts = table.split(".")
    if len(parts) == 1:
        db, tbl = spark.catalog.currentDatabase(), parts[0]
    elif len(parts) == 2:
        db, tbl = parts
    else:
        raise ValueError(f"expected [db.]table, got {table!r}")
    rel = tbl if db == "default" else f"{db}.db/{tbl}"
    jvm = spark._jvm
    loc = jvm.org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + f"/{rel}"
    )
    fs = loc.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(loc):
        fs.delete(loc, True)
    (
        partitioned(pages, n_partitions)
        .write.mode("overwrite")
        .bucketBy(n_partitions, "partition_id")
        .sortBy("partition_id")
        .saveAsTable(table)
    )
    return spark.table(table)


def run_with_checkpoint(
    spark: SparkSession,
    pages: DataFrame,
    output_path: str,
    checkpoint_path: str,
    run_id: str | None = None,
    n_partitions: int = 64,
    input_snapshot: str = "",
    n_waves: int = 4,
    verify_readback: bool = False,
    on_progress=None,
    digest_path: str | None = None,
    stage_source: bool = False,
) -> dict:
    """Extract ``pages`` into ``output_path`` with exact resume.

    ``on_progress``: optional callable receiving one dict per committed wave
    ({run_id, wave, n_waves, partitions_done, partitions_total, n_docs,
    n_ok, n_err, docs_per_sec}) — the live per-job progress surface the
    reference exposed over HTTP (``job_manager.py:108-150``), here a
    driver-side hook (also logged on ``gonova.checkpoint``).

    Work proceeds in ``n_waves`` commit units: each wave extracts a slice of
    the todo partitions, commits its data (dynamic partition overwrite) and
    then its checkpoint rows.  A kill loses at most the in-flight wave; the
    next invocation anti-joins completed partitions and redoes only the
    rest.  Returns {run_id, partitions_done_before, partitions_total,
    n_docs, n_ok, n_err}.  Safe to call repeatedly with the same run_id: a
    fully-completed run is a no-op.

    Metrics ride the write pass via ``df.observe`` (per-partition
    conditional aggregates, retry-safe, computed by the same job that
    writes) — the extracted text is NOT re-read to meter it.
    ``verify_readback=True`` re-reads the written wave and asserts the
    observed counts match (audit mode; 2x read cost of the dominant byte
    volume, off by default).  Every wave partition id gets a checkpoint
    row, including zero-document partitions — otherwise dynamic overwrite
    writes no directory for them and resume would re-run them forever.

    ``digest_path``: when set (the digest-table incremental mode), each
    wave also commits its urls' 16-byte md5 digests, partitioned by
    partition_id, BETWEEN the data write and the checkpoint-row write.
    All three stores are idempotent dynamic partition overwrites, so the
    ordering guarantees a partition marked completed always has both its
    data and its digests — a crash can at worst re-run one wave in place.

    ``stage_source=True`` writes the partition_id-augmented source ONCE
    (under ``output_path/_staged_source``, todo partitions only) and runs
    every wave off that staging: wave scans then file-prune to their own
    partition directories instead of re-reading the full input n_waves
    times.  Worth it when n_waves is large or the source is remote/an
    unpartitioned table; costs one extra full write+read of the input.
    On an Iceberg corpus, bucketing the table by url achieves the same
    pruning with no staging copy.
    """
    run_id = run_id or uuid.uuid4().hex

    # A source that ALREADY carries partition_id (stage_bucketed_table's
    # output, or a restaged copy) must keep its stored COLUMN: recomputing
    # via withColumn would replace the bucketed table's attribute with a
    # fresh pmod(xxhash64(url)) expression — same values, but the wave
    # filter then no longer references the bucket column and bucket
    # pruning silently turns off (verified in the executed plan).  The
    # stored values are the same pure function of url, so trusting the
    # column is exact; `partitioned` is only needed for raw page sources.
    corpus = (
        pages if "partition_id" in pages.columns else partitioned(pages, n_partitions)
    )
    if "partition_id" in pages.columns:
        # belt-and-braces: a source staged with MORE partitions than this
        # run's n_partitions would leave rows with partition_id >=
        # n_partitions outside every wave filter — silent data loss.  One
        # narrow-column scan is the price of refusing that.
        max_pid = corpus.agg(F.max("partition_id")).collect()[0][0]
        if max_pid is not None and max_pid >= n_partitions:
            raise ValueError(
                f"source carries partition_id up to {max_pid} but "
                f"n_partitions={n_partitions}: rows above the range would "
                "be silently skipped — restage the source or raise "
                "n_partitions"
            )
    done = completed_partitions(spark, checkpoint_path, run_id, input_snapshot)
    done_ids = {r["partition_id"] for r in done.collect()}  # <= n_partitions ints
    todo_ids = sorted(set(range(n_partitions)) - done_ids)

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    if stage_source and todo_ids:
        # one pass over the source now; every wave scan below file-prunes
        # to its own partition_id dirs (resume restages only todo dirs).
        # repartition BY partition_id first: without it every source scan
        # task writes a file into every partition dir (n_dirs x n_tasks
        # small-files explosion); with it each dir gets exactly one file.
        stage_path = f"{output_path}/_staged_source"
        (
            corpus.where(F.col("partition_id").isin([int(i) for i in todo_ids]))
            .repartition(len(todo_ids), F.col("partition_id"))
            .write.partitionBy("partition_id")
            .mode("overwrite")
            .parquet(stage_path)
        )
        corpus = spark.read.parquet(stage_path)
    wave_size = max(1, -(-len(todo_ids) // max(1, n_waves))) if todo_ids else 1
    for w in range(0, len(todo_ids), wave_size):
        wave_ids = todo_ids[w : w + wave_size]
        started = _now()
        # Single shuffle per wave, placed *before* extraction: align physical
        # partitioning with partition_id so (a) extraction is narrow, (b) the
        # partitionBy write emits one file per partition dir with no second
        # shuffle of the (large) extracted text.  partition_id is
        # xxhash64(url)-derived, so this also uniformly spreads hot hosts.
        wave = (
            corpus.where(F.col("partition_id").isin([int(i) for i in wave_ids]))
            .withColumn("bytes_in", F.octet_length("html").cast("long"))
            .repartition(len(wave_ids), F.col("partition_id"))
        )
        extracted = extract_pages(wave, passthrough=("partition_id", "bytes_in"))
        # per-partition metrics as observed metrics on the write job itself:
        # one conditional aggregate triple per wave partition id, evaluated
        # JVM-side during the write — no second pass over the extracted text.
        # (Expression count is 3 * wave_size; with very wide waves either
        # raise n_waves or flip verify_readback on and meter from the data.)
        from pyspark.sql import Observation

        obs = Observation(f"wave-{run_id}-{w}")
        exprs = []
        for pid in wave_ids:
            p = F.col("partition_id") == int(pid)
            exprs.append(
                F.sum(F.when(p & F.col("success"), 1).otherwise(0)).alias(f"ok_{pid}")
            )
            exprs.append(
                F.sum(F.when(p & ~F.col("success"), 1).otherwise(0)).alias(f"err_{pid}")
            )
            exprs.append(
                F.sum(F.when(p, F.col("bytes_in")).otherwise(0)).alias(f"bytes_{pid}")
            )
        (
            extracted.observe(obs, *exprs)
            .write.partitionBy("partition_id")
            .mode("overwrite")
            .parquet(output_path)
        )
        got = obs.get  # blocks until the write action finished
        if digest_path is not None:
            # digests commit AFTER the wave's data, BEFORE its checkpoint
            # row: completed => digested.  Narrow url-only scan (column-
            # pruned; file-pruned too under stage_source), idempotent
            # dynamic overwrite per partition dir — a re-run wave rewrites
            # its digests in place, never duplicates them.
            (
                wave.select("partition_id", url_digest_expr("url").alias("url_digest"))
                .write.partitionBy("partition_id")
                .mode("overwrite")
                .parquet(digest_path)
            )
        finished = _now()
        ckpt_rows = []  # one row per wave pid, zero-doc partitions included
        for pid in wave_ids:
            n_ok = int(got[f"ok_{pid}"] or 0)
            n_err = int(got[f"err_{pid}"] or 0)
            ckpt_rows.append(
                (
                    run_id,
                    int(pid),
                    "completed",
                    n_ok + n_err,
                    n_ok,
                    n_err,
                    int(got[f"bytes_{pid}"] or 0),
                    started,
                    finished,
                    input_snapshot,
                )
            )
        if verify_readback:
            meter = {
                r["partition_id"]: r
                for r in spark.read.parquet(output_path)
                .where(F.col("partition_id").isin([int(i) for i in wave_ids]))
                .groupBy("partition_id")
                .agg(
                    F.count(F.lit(1)).alias("n_docs"),
                    F.sum(F.col("success").cast("long")).alias("n_ok"),
                    F.sum((~F.col("success")).cast("long")).alias("n_err"),
                    F.sum("bytes_in").alias("bytes_in"),
                )
                .collect()
            }
            for row in ckpt_rows:
                pid, n_docs, n_ok, n_err, n_bytes = row[1], row[3], row[4], row[5], row[6]
                read = meter.get(pid)
                got_back = (
                    (read["n_docs"], read["n_ok"], read["n_err"], read["bytes_in"])
                    if read is not None
                    else (0, 0, 0, 0)
                )
                if got_back != (n_docs, n_ok, n_err, n_bytes):
                    raise RuntimeError(
                        f"checkpoint meter mismatch for partition {pid}: "
                        f"observed {(n_docs, n_ok, n_err, n_bytes)} vs "
                        f"read-back {got_back}"
                    )
        spark.createDataFrame(ckpt_rows, CHECKPOINT_SCHEMA).write.mode(
            "append"
        ).parquet(checkpoint_path)
        wave_docs = sum(r[3] for r in ckpt_rows)
        wave_secs = max((finished - started).total_seconds(), 1e-9)
        progress = {
            "run_id": run_id,
            "wave": w // wave_size + 1,
            "n_waves": -(-len(todo_ids) // wave_size),
            "partitions_done": len(done_ids) + w + len(wave_ids),
            "partitions_total": n_partitions,
            "n_docs": wave_docs,
            "n_ok": sum(r[4] for r in ckpt_rows),
            "n_err": sum(r[5] for r in ckpt_rows),
            "docs_per_sec": round(wave_docs / wave_secs, 1),
        }
        _LOG.info("wave committed: %s", progress)
        if on_progress is not None:
            on_progress(progress)

    stats = (
        spark.read.schema(CHECKPOINT_SCHEMA)
        .parquet(checkpoint_path)
        .where((F.col("run_id") == run_id) & (F.col("input_snapshot") == input_snapshot))
        .agg(
            F.countDistinct("partition_id").alias("parts"),
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_ok").alias("n_ok"),
            F.sum("n_err").alias("n_err"),
        )
        .collect()[0]
    )
    return {
        "run_id": run_id,
        "partitions_done_before": len(done_ids),
        "partitions_total": stats["parts"],
        "n_docs": stats["n_docs"],
        "n_ok": stats["n_ok"],
        "n_err": stats["n_err"],
    }
