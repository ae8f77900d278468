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
    n_salts: int = 16,
) -> DataFrame:
    """Cap rows per domain/source — the anti-domination quota.

    A handful of giant hosts otherwise dominate a crawl-derived training
    mix; public pipelines cap documents per domain.  Keeps the top
    ``max_per_key`` rows per key, ranked by ``order_col`` DESC (e.g. a
    quality score; None ranks by ``id_col`` ASC alone), with ``id_col``
    ASC as the deterministic tiebreak.

    Two-phase salted top-N, because the target workload IS the skewed
    case (one hot host holding half the crawl): a single
    ``row_number() over (partition by key)`` would shuffle every row of
    the hot key into ONE task's sort.  Instead:

      phase 1: partial top-``max_per_key`` per ``(key, salt)`` where
        salt = pmod(xxhash64(id), n_salts) — the hot key's rows sort in
        ``n_salts`` parallel tasks, each emitting at most ``max_per_key``
        survivors;
      phase 2: final top-``max_per_key`` window per ``key`` over the
        ≤ ``n_salts × max_per_key`` survivors — a bounded, tiny sort.

    The keeper set is byte-identical to the single-window form: any row
    in the global top-N of its key is necessarily in the top-N of its
    own ``(key, salt)`` cell, so phase 1 never drops a global keeper
    (proved against the one-window form in tests).  Salting is
    deterministic (hash of ``id_col``, no ``rand()``), so retries and
    resumed runs reproduce the identical sample.
    """
    from pyspark.sql import Window

    order = (
        [F.col(order_col).desc(), F.col(id_col).asc()]
        if order_col is not None
        else [F.col(id_col).asc()]
    )
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts)).cast("int")
    partial = Window.partitionBy(F.col(key_col), F.col("_salt")).orderBy(*order)
    final = Window.partitionBy(F.col(key_col)).orderBy(*order)
    return (
        df.withColumn("_salt", salt)
        .withColumn("_rn", F.row_number().over(partial))
        .where(F.col("_rn") <= max_per_key)
        .drop("_rn")
        .withColumn("_rn", F.row_number().over(final))
        .where(F.col("_rn") <= max_per_key)
        .drop("_rn", "_salt")
    )
