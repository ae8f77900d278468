"""Deterministic sampling for training-mix construction.

Both operators key every decision on a per-row hash, never on ``rand()``:
retries, resumed runs, and re-executed stages reproduce the identical
sample (Spark re-runs tasks at will — nondeterministic sampling silently
duplicates/drops rows across stage retries), and one stratum's sample is
independent of every other stratum's rows.

All integer math: keep/assign thresholds are precomputed integer cut
points against the hash value, so there is no float comparison to drift
between engines — the md5 variant is DuckDB-reproducible bit-for-bit
(``('0x' || substr(md5(k),1,7))::BIGINT`` mirrors Spark's
``conv(substring(md5(k),1,7),16,10)``), and the xxhash64 variant is the
cheap production path (same split as every other hash-variant operator
in this package).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_HASH_BITS = 28  # 7 hex digits of md5 -> uniform in [0, 2^28)


def _row_hash(key_col: str, hash_fn: str) -> Column:
    k = F.col(key_col).cast("string")
    if hash_fn == "md5":
        return F.conv(F.substring(F.md5(k), 1, 7), 16, 10).cast("bigint")
    return F.pmod(F.xxhash64(k), F.lit(1 << _HASH_BITS))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    strata_col: str = "source",
    key_col: str = "doc_id",
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-stratum Bernoulli sample at per-source rates (data-mix weights).

    Keeps a row iff hash(key) < rate(stratum) * 2^28 — deterministic per
    key, exact-rate in expectation, no shuffle at all (a pure filter that
    pushes down to the scan).  Strata absent from ``rates`` use
    ``default_rate``.
    """
    scale = 1 << _HASH_BITS
    expr: Column = F.lit(int(default_rate * scale))
    for s, r in sorted(rates.items()):
        expr = F.when(F.col(strata_col) == s, F.lit(int(r * scale))).otherwise(expr)
    return df.where(_row_hash(key_col, hash_fn) < expr)


def hash_split(
    df: DataFrame,
    splits: dict[str, float],
    key_col: str = "doc_id",
    hash_fn: str = "md5",
) -> DataFrame:
    """Assign each row to a named split (train/val/test) by hash range.

    Fractions are turned into cumulative integer cut points over [0, 2^28);
    the row's hash picks its bucket.  Membership is stable under appends:
    adding documents never moves an existing document between splits (the
    property random assignment lacks).  Adds a ``split`` column; no shuffle.
    """
    scale = 1 << _HASH_BITS
    names = list(splits)
    cuts, acc = [], 0.0
    for n in names:
        acc += splits[n]
        cuts.append(int(acc * scale))
    if abs(acc - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {acc}")
    cuts[-1] = scale  # guard float rounding: last bucket owns the tail
    h = _row_hash(key_col, hash_fn)
    expr: Column = F.lit(names[-1])
    for n, cut in zip(names[-2::-1], cuts[-2::-1]):
        expr = F.when(h < cut, F.lit(n)).otherwise(expr)
    # note the reversed fold: the innermost when is the FIRST bucket, so
    # each row lands in the lowest cut point that exceeds its hash
    return df.withColumn("split", expr)


def domain_cap(
    df: DataFrame,
    max_per_key: int,
    key_col: str = "source",
    order_col: str | None = None,
    id_col: str = "doc_id",
    n_salts: int | str = "auto",
    hot_threshold: int | None = None,
) -> DataFrame:
    """Cap rows per domain/source — the anti-domination quota.

    A handful of giant hosts otherwise dominate a crawl-derived training
    mix; public pipelines cap documents per domain.  Keeps the top
    ``max_per_key`` rows per key, ranked by ``order_col`` DESC (e.g. a
    quality score; None ranks by ``id_col`` ASC alone), with ``id_col``
    ASC as the deterministic tiebreak.

    Skew math first (measured, BENCH §5 round-4): Spark's
    ``InferWindowGroupLimit`` rule already turns the
    ``row_number() <= k`` filter into a MAP-SIDE partial top-k before
    the exchange — on the 50%-hot-host bench corpus the window shuffle
    carries 113k records instead of 1.2M.  What the rule canNOT bound is
    the reduce side: every map task still sends up to ``k`` rows of the
    hot key to ONE final task, so the hot task's sort input grows as
    ``n_map_tasks × k`` — harmless at 128 map tasks, a straggler again
    at the 10^5-task scans a 100 TB corpus produces.

    Hence the skew-split plan (single corpus scan, plus one cheap
    key-count scan):

      1. a map-side-combined count finds the HOT keys (more than
         ``hot_threshold`` rows; default ``50 * max_per_key``) — a tiny,
         broadcastable set by construction (at most n_rows/hot_threshold
         keys exist);
      2. one window pass partitioned by ``(key, salt)`` where cold keys
         take the constant salt 0 (their phase-1 IS the exact final
         top-k) and hot keys take salt = pmod(xxhash64(id), S) — a hot
         key's phase-1 cell receives ``min(n_map_tasks × k, H / S)``
         rows (H = the key's row count from the step-1 scan);
      3. a final window per ``key`` over the survivors re-ranks: a no-op
         re-derivation for cold keys, and for hot keys a sort over at
         most ``S × max_per_key`` rows — bounded by CONSTRUCTION,
         independent of cluster size.

    Salt-count sizing (``n_salts="auto"``, the default): a FIXED S can't
    hold the bound at every scale — phase-1 cells shrink as H/S while
    phase-2 grows as S×k, so the minimax choice per hot key is
    ``S = ceil(sqrt(H / k))``, making BOTH phases ≤ sqrt(H × k) rows.
    A 10^10-row key capped at k=10^5 then sorts ≤ ~3×10^7 rows per task
    instead of 10^10 — and the sizing input H is already computed by the
    step-1 key-count scan, so callers never tune anything (the map-task
    count only ever LOWERS the phase-1 bound via the WindowGroupLimit
    partial top-k, so sizing ignores it conservatively).  Pass an int to
    pin the round-4 fixed-salt behavior; the keeper set is proven
    identical across auto and every fixed S in tests.

    Local cost honesty: on the page-cached 200k-row bench corpus this is
    ~2x the one-window wall (the extra key-count scan + the survivors
    exchange), because a 1M-row single-task sort costs nothing there —
    the operator buys the bounded-by-construction hot task for a small
    constant factor that shrinks as the hot key grows.

    The keeper set is byte-identical to the single-window form: any row
    in the global top-N of its key is necessarily in the top-N of its
    own ``(key, salt)`` cell, so phase 1 never drops a global keeper
    (proved against the one-window form across salt counts and
    thresholds in tests).  Everything is deterministic (hash salt, no
    ``rand()``), so retries and resumed runs reproduce the identical
    sample.
    """
    from pyspark.sql import Window

    order = (
        [F.col(order_col).desc(), F.col(id_col).asc()]
        if order_col is not None
        else [F.col(id_col).asc()]
    )
    if hot_threshold is None:
        hot_threshold = 50 * max_per_key
    if n_salts == "auto":
        # per-key minimax sizing from the count the scan already produced:
        # S = ceil(sqrt(H / k)), never below 2 for a hot key
        ns_expr = F.greatest(
            F.ceil(F.sqrt(F.col("_kn") / F.lit(max_per_key))).cast("int"),
            F.lit(2),
        )
    else:
        ns_expr = F.lit(int(n_salts))
    hot_keys = (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("_kn"))
        .where(F.col("_kn") > hot_threshold)
        .select(key_col, ns_expr.alias("_ns"))
    )
    # single scan: the hot flag (and its salt count) rides a broadcast
    # join; cold keys get the constant salt 0, so phase 1 IS their exact
    # final top-N and phase 2 merely re-derives the same rank — no
    # branch, no second corpus scan
    salt = F.when(
        F.col("_ns").isNotNull(),
        F.pmod(F.xxhash64(F.col(id_col)), F.col("_ns")).cast("int"),
    ).otherwise(F.lit(0))
    partial = Window.partitionBy(F.col(key_col), F.col("_salt")).orderBy(*order)
    final = Window.partitionBy(F.col(key_col)).orderBy(*order)
    return (
        df.join(F.broadcast(hot_keys), [key_col], "left")
        .withColumn("_salt", salt)
        .withColumn("_rn", F.row_number().over(partial))
        .where(F.col("_rn") <= max_per_key)
        .drop("_rn")
        .withColumn("_rn", F.row_number().over(final))
        .where(F.col("_rn") <= max_per_key)
        .select(*df.columns)
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_partitions: int | None = None,
    count_expr: Column | None = None,
) -> DataFrame:
    """Token-budget training-sequence packing (GPT-style concatenation).

    Pretraining pipelines concatenate the corpus in a pinned document
    order and slice the token stream into fixed-``budget`` sequences; a
    document belongs to the sequence (``chunk_id``) where it STARTS.
    Returns (id_col, n_tokens, start_offset, chunk_id) with
    ``start_offset`` = total tokens before this doc in ``id_col`` order
    and ``chunk_id = start_offset // budget`` — a pure function of the
    corpus, so retries/resumes reproduce identical packing and appends
    never move existing docs (new ids sort after old ones when ids are
    monotone).

    A global running sum would be one all-rows window (single-task scan
    — the classic prefix-sum scale trap).  Instead the standard
    two-phase scan: range-repartition the narrow (id, n_tokens)
    projection on ``id_col``, sum per partition, prefix-add the ≤
    ``n_partitions`` partition totals DRIVER-side (bounded scalar
    state, like the CC convergence loop), then one within-partition
    window adds the broadcast offset.  ``localCheckpoint`` pins the
    range partitioning so the per-partition sums and the final pass see
    the identical ``spark_partition_id`` assignment (range sampling is
    not otherwise guaranteed stable across jobs).

    ``count_expr`` overrides the default whitespace token counter with
    any Column over the row — training budgets are really denominated in
    SUBWORD tokens, so the real pipeline passes
    ``bpe_token_count_udf(merges)(text_col)`` here (an Arrow-batched
    pandas UDF; it prices the count column build only — the prefix-sum
    machinery is unchanged and stays JVM-side).  Driver queries keep the
    default pre-tokenizer so the DuckDB oracle can replay the counts and
    the no-BatchEvalPython plan guard stays green.
    """
    from pyspark.sql import Window

    from .textstats import token_count_expr

    spark = df.sparkSession
    n = n_partitions or spark.sparkContext.defaultParallelism
    counter = count_expr if count_expr is not None else token_count_expr(text_col)
    narrow = df.select(F.col(id_col), counter.alias("n_tokens"))
    # Round-6: the range buckets come from the id min/max (one aggregate
    # job that column-prunes to the id alone) instead of
    # ``repartitionByRange`` — that operator pays a separate SAMPLING pass
    # over the input plus a physical shuffle just to learn cut points,
    # and its assignment is only stable because of the checkpoint.  A
    # ``floor((id - lo) / width)`` bucket is a PURE function of the id:
    # monotone in id (so per-bucket prefix sums compose exactly as
    # before), identical across retries/jobs by construction, and needs
    # no physical repartition at all — the per-bucket sums groupBy and
    # the final window provide their own (tiny, AQE-coalesced)
    # exchanges.  Output is byte-identical: start_offset depends only on
    # the id ORDER, not on where bucket boundaries fall.
    from pyspark.sql.types import DoubleType, FloatType, NumericType

    id_type = df.schema[id_col].dataType
    if isinstance(id_type, NumericType) and not isinstance(
        id_type, (FloatType, DoubleType)
    ):
        lohi = narrow.agg(
            F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
        ).first()
        if lohi["lo"] is None:
            pid = F.lit(0)
        else:
            # bucket in DOUBLE space: ids may span the whole int64 range
            # (curate_job keys on xxhash64(url)), so (id - lo) overflows
            # BIGINT; the double mapping is monotone non-decreasing in id
            # — all the prefix sum needs — and boundary rounding merely
            # moves a row between adjacent buckets, never reorders ids.
            # NULL ids take bucket 0: they sort first in the window
            # (asc = nulls first), matching the range partitioner's
            # nulls-smallest placement in the fallback path.
            span = float(int(lohi["hi"]) - int(lohi["lo"])) + 1.0
            width = max(1.0, span / n)
            pid = F.when(F.col(id_col).isNull(), F.lit(0)).otherwise(
                F.floor(
                    (F.col(id_col).cast("double") - float(lohi["lo"])) / width
                )
            )
        ranged = narrow.withColumn("_pid", pid.cast("int")).localCheckpoint(
            eager=False
        )
    else:
        # non-numeric ids keep the sampled range partitioning (the
        # checkpoint pins the otherwise-unstable partition assignment);
        # float/double ids too — NaN breaks the min/max arithmetic while
        # the range partitioner's NaN-last ordering handles them
        ranged = (
            narrow.repartitionByRange(n, F.col(id_col))
            .withColumn("_pid", F.spark_partition_id())
            .localCheckpoint(eager=False)
        )
    sums = {
        r["_pid"]: r["s"]
        for r in ranged.groupBy("_pid").agg(F.sum("n_tokens").alias("s")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(sums):
        offsets.append((pid, acc))
        acc += int(sums[pid])
    off_df = spark.createDataFrame(offsets, "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(F.col(id_col))
    start = (F.col("_off") + F.sum("n_tokens").over(w) - F.col("n_tokens")).alias(
        "start_offset"
    )
    return (
        ranged.join(F.broadcast(off_df), "_pid")
        .select(F.col(id_col), F.col("n_tokens"), start)
        .withColumn(
            "chunk_id", F.floor(F.col("start_offset") / budget).cast("int")
        )
    )
