"""Bloom-filter crawl-frontier dedup — "have we ever fetched this url?"

A recrawl frontier asks a membership question against every url the
crawl has EVER seen.  The exact answer is an anti-join against the
url-digest history (``checkpoint.run_incremental`` does that for
correctness-critical commits); the frontier fast path wants a compact
approximate structure instead: a Bloom filter answers "definitely new"
(no false negatives) or "probably seen" (bounded false-positive rate),
and the filter for 10^10 urls at 1% fpp is ~12 GB of bits vs TBs of
digests.

Spark-first representation: the filter is a DATAFRAME of (word_idx,
bits) int64 words, built with one explode + one ``bit_or`` groupBy
(map-side combine collapses per-partition masks) — it never lives on
the driver, broadcasts to probes, and unions with other filters by
re-aggregating ``bit_or``.  Membership probes explode each candidate's
k positions, broadcast-join the word table, and demand all k bits set —
one narrow pass over the candidates, no corpus shuffle.

Hash variants follow the repo-wide convention: ``xxhash64`` is the fast
production default; ``affine`` (one md5 -> k affine transforms mod
2^31-1, the universal family ``dedup.py`` uses for minhash) lets the
DuckDB oracle replay bit construction AND probing exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import _affine_params, _MERSENNE31, _md5_low60


def _positions_expr(url_col: Column, m_bits: int, k: int, hash_fn: str) -> Column:
    """Array of the k bit positions for one url (deterministic, engine-
    reproducible for hash_fn='affine')."""
    if hash_fn == "affine":
        h0 = _md5_low60(url_col) % F.lit(_MERSENNE31)
        pos = [
            ((F.lit(a) * h0 + F.lit(b)) % F.lit(_MERSENNE31)) % F.lit(m_bits)
            for a, b in (_affine_params(i) for i in range(k))
        ]
    else:
        pos = [
            F.pmod(F.xxhash64(F.lit(i), url_col), F.lit(m_bits))
            for i in range(k)
        ]
    return F.array(*pos)


def url_bloom_bits(
    seen: DataFrame,
    m_bits: int,
    k: int = 5,
    url_col: str = "url",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Build the filter: (word_idx bigint, bits bigint), one row per
    int64 word with at least one bit set (<= m_bits/64 rows total).

    One explode (k positions per url) + one bit_or groupBy; duplicate
    urls cost nothing extra (idempotent OR).  Filters built with the
    same (m_bits, k, hash_fn) union by ``bit_or`` re-aggregation.
    """
    c = F.col(url_col)
    pos = F.explode(_positions_expr(c, m_bits, k, hash_fn)).alias("_pos")
    return (
        seen.select(pos)
        .select(
            (F.col("_pos") / 64).cast("bigint").alias("word_idx"),
            # shiftleft needs a literal shift in the Python API; the SQL
            # form takes the column offset directly
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))").alias(
                "_mask"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_mask").alias("bits"))
    )


def frontier_probe(
    candidates: DataFrame,
    bloom_bits: DataFrame,
    m_bits: int,
    k: int = 5,
    url_col: str = "url",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Probe: candidates + ``probably_seen`` (true iff all k bits set).

    No false negatives by construction (same positions as the build);
    false positives occur at the standard Bloom rate
    (1 - e^(-k*n/m))^k.  Candidates explode to k probe rows, broadcast-
    join the word table, and fold back with ONE groupBy on the url —
    hits counted with a null-safe conditional sum, so an absent word row
    (left join miss) is an unset bit, not a dropped candidate.
    """
    c = F.col(url_col)
    probes = candidates.select(
        c.alias("url"),
        F.explode(_positions_expr(c, m_bits, k, hash_fn)).alias("_pos"),
    ).select(
        "url",
        (F.col("_pos") / 64).cast("bigint").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))").alias(
            "_mask"
        ),
    )
    joined = probes.join(F.broadcast(bloom_bits), "word_idx", "left")
    hit = (
        F.col("bits").isNotNull()
        & (F.col("bits").bitwiseAND(F.col("_mask")) != 0)
    )
    return (
        joined.groupBy("url")
        .agg(F.sum(F.when(hit, 1).otherwise(0)).alias("_hits"))
        .select("url", (F.col("_hits") == k).alias("probably_seen"))
    )
