"""Bloom-filter crawl-frontier: build/probe semantics on hand-built urls.

The filter is a DataFrame of (word_idx, bits) int64 words; the probe is
a broadcast join.  The affine variant is verified verdict-for-verdict
against a pure-Python replica (false positives included), the xxhash64
production variant against the structural guarantees (no false
negatives; low false-positive rate at the sized m).
"""

import hashlib

import pyspark.sql.functions as F
import pytest

from gonova_document_parser_spark.functions.dedup import _affine_params, _MERSENNE31
from gonova_document_parser_spark.functions.frontier import (
    frontier_probe,
    url_bloom_bits,
)

M_BITS = 1 << 14
K = 5

SEEN = [f"https://site{i % 7}.exampleN.org/doc{i}" for i in range(200)]
NEW = [f"https://fresh.exampleN.org/page{i}" for i in range(60)]


def _df(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def _py_positions(url: str, m_bits: int, k: int) -> list[int]:
    """Pure-Python replica of the affine position family."""
    h0 = int(hashlib.md5(url.encode()).hexdigest()[:15], 16) % _MERSENNE31
    out = []
    for i in range(k):
        a, b = _affine_params(i)
        out.append(((a * h0 + b) % _MERSENNE31) % m_bits)
    return out


@pytest.mark.parametrize("hash_fn", ["xxhash64", "affine"])
def test_no_false_negatives(spark, hash_fn):
    bits = url_bloom_bits(_df(spark, SEEN), M_BITS, K, hash_fn=hash_fn)
    out = frontier_probe(_df(spark, SEEN), bits, M_BITS, K, hash_fn=hash_fn)
    rows = {r["url"]: r["probably_seen"] for r in out.collect()}
    assert len(rows) == len(SEEN)
    assert all(rows.values()), "a seen url probed as new: false negative"


@pytest.mark.parametrize("hash_fn", ["xxhash64", "affine"])
def test_new_urls_mostly_unseen(spark, hash_fn):
    # 200 urls * 5 bits in 16384 -> theoretical fpp ~ (1-e^(-1000/16384))^5
    # ~ 1e-6; deterministic hashes, so demand a hard majority-new bound.
    bits = url_bloom_bits(_df(spark, SEEN), M_BITS, K, hash_fn=hash_fn)
    out = frontier_probe(_df(spark, NEW), bits, M_BITS, K, hash_fn=hash_fn)
    rows = {r["url"]: r["probably_seen"] for r in out.collect()}
    assert len(rows) == len(NEW)
    fp = sum(rows.values())
    assert fp <= len(NEW) // 10, f"{fp} false positives at ~1e-6 expected fpp"


def test_affine_matches_python_replica(spark):
    """Verdict-for-verdict identity with a pure-Python bloom — the same
    property the DuckDB oracle leans on (distinct-position membership ==
    packed-word membership)."""
    # tiny filter so false positives actually occur and must still match
    m = 256
    seen_pos = {p for u in SEEN for p in _py_positions(u, m, K)}
    expected = {
        u: all(p in seen_pos for p in _py_positions(u, m, K)) for u in SEEN + NEW
    }
    assert not all(expected[u] for u in NEW), "fixture too easy: no collisions"
    bits = url_bloom_bits(_df(spark, SEEN), m, K, hash_fn="affine")
    out = frontier_probe(_df(spark, SEEN + NEW), bits, m, K, hash_fn="affine")
    got = {r["url"]: r["probably_seen"] for r in out.collect()}
    assert got == expected


def test_union_by_reaggregation(spark):
    """bit_or re-aggregation of two filters == the filter of the union —
    the property that lets per-crawl filters merge without rebuilding."""
    a, b = SEEN[:100], SEEN[100:]
    bits_a = url_bloom_bits(_df(spark, a), M_BITS, K)
    bits_b = url_bloom_bits(_df(spark, b), M_BITS, K)
    merged = (
        bits_a.unionByName(bits_b)
        .groupBy("word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )
    whole = url_bloom_bits(_df(spark, SEEN), M_BITS, K)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in whole.collect()
    }


def test_duplicate_urls_idempotent(spark):
    """Re-adding seen urls changes no words (OR idempotence) — recrawl
    appends cost nothing."""
    once = url_bloom_bits(_df(spark, SEEN), M_BITS, K)
    thrice = url_bloom_bits(_df(spark, SEEN * 3), M_BITS, K)
    assert {tuple(r) for r in once.collect()} == {tuple(r) for r in thrice.collect()}


def test_probe_plan_broadcasts(spark):
    """The word table reaches the probe as a broadcast — no corpus-side
    shuffle join at 10^10-url scale."""
    bits = url_bloom_bits(_df(spark, SEEN), M_BITS, K)
    plan = (
        frontier_probe(_df(spark, NEW), bits, M_BITS, K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# politeness scheduler
# ---------------------------------------------------------------------------

def _frontier_df(spark):
    rows = [
        (f"https://site{i % 3}.exampleN.org/p{i:03d}", i % 11)
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "url string, priority bigint")


def test_schedule_host_locality_and_ranks(spark):
    """All of a host's urls land on ONE fetcher; ranks are a dense 1..n
    permutation per host ordered by (priority desc, url)."""
    from gonova_document_parser_spark.functions.frontier import schedule_frontier

    out = schedule_frontier(
        _frontier_df(spark), n_fetchers=4, priority_col="priority"
    ).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r.host, []).append(r)
    assert len(by_host) == 3
    for host, rows in by_host.items():
        assert len({r.fetcher for r in rows}) == 1, host
        ranks = sorted(r.fetch_rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1)), host
        ordered = sorted(rows, key=lambda r: (-r.priority, r.url))
        assert [r.fetch_rank for r in ordered] == ranks, host


def test_schedule_offsets_respect_per_host_delay(spark):
    """Planted delay for one host; default elsewhere — consecutive
    fetches inside a host are spaced exactly delay apart, starting 0."""
    from gonova_document_parser_spark.functions.frontier import schedule_frontier

    delays = _frontier_df(spark).sparkSession.createDataFrame(
        [("site1.examplen.org", 2.0)], "host string, delay_sec double"
    )
    out = schedule_frontier(
        _frontier_df(spark),
        n_fetchers=4,
        default_delay_sec=0.5,
        priority_col="priority",
        delays=delays,
    ).collect()
    for r in out:
        step = 2.0 if r.host == "site1.examplen.org" else 0.5
        assert r.fetch_offset_sec == (r.fetch_rank - 1) * step, r


def test_schedule_md5_variant_matches_python_replica(spark):
    """md5 fetcher assignment is the documented low-60-bit hash — the
    same value a DuckDB oracle computes."""
    from gonova_document_parser_spark.functions.frontier import schedule_frontier

    out = schedule_frontier(
        _frontier_df(spark), n_fetchers=8, hash_fn="md5"
    ).collect()
    for r in out:
        expect = int(hashlib.md5(r.host.encode()).hexdigest()[:15], 16) % 8
        assert r.fetcher == expect, r.host


def test_probe_shuffle_join_fallback_matches_broadcast(spark):
    """VERDICT r5 #2: broadcast_bits=False (the at-scale path for filters
    beyond the 8 GB broadcast ceiling) must return the identical verdict
    set via a plain word_idx equi-join — the rare_word_stats path-
    agreement pattern."""
    bits = url_bloom_bits(_df(spark, SEEN), M_BITS, K, hash_fn="affine")
    cands = _df(spark, SEEN[::3] + NEW[::2])
    via_bc = {
        (r["url"], r["probably_seen"])
        for r in frontier_probe(cands, bits, M_BITS, K, hash_fn="affine").collect()
    }
    via_shuffle = {
        (r["url"], r["probably_seen"])
        for r in frontier_probe(
            cands, bits, M_BITS, K, hash_fn="affine", broadcast_bits=False
        ).collect()
    }
    assert via_bc == via_shuffle and len(via_bc) > 0
    plan = frontier_probe(
        cands, bits, M_BITS, K, hash_fn="affine", broadcast_bits=False
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan
