"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``      — flagship stage-fused extraction over a pages corpus
                        rendered deterministically from sf0.001 documents.
``queries()``         — one entry per implemented operator (SURVEY.md §2);
                        each callable: (spark, sf_dir) -> DataFrame.
``oracle_sql()``      — DuckDB-equivalent ANSI SQL per query, including the
                        flagship extraction pipeline (the deterministic page
                        render + extractor reduce to closed-form SQL, so the
                        byte-identical-text contract is driver-verified).
                        Only engine-hash/kmeans-dependent ops (raw LSH
                        candidate sets, xxhash64 ANN buckets, seeded KMeans
                        cells) are rows-only here; those are pytest-pinned.

Column-name parity rule: every computed column is aliased identically in the
Spark builder and the SQL string.  Floats are rounded (and DuckDB-side cast
to DOUBLE, since its ROUND yields DECIMAL) so cross-engine value hashes
match; timestamps are formatted to fixed-width strings for the same reason.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gonova_document_parser_spark.corpus import pages_from_documents
from gonova_document_parser_spark.functions.dedup import (
    exact_dup_groups,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash64,
)
from gonova_document_parser_spark.functions.similarity import (
    ann_topk_lsh,
    brute_force_topk,
)
from gonova_document_parser_spark.functions.textstats import (
    STOPWORDS,
    lang_id_expr,
    normalized_text_expr,
    quality_score_expr,
    token_count_expr,
)
from gonova_document_parser_spark.operators.extract import extract_pages
from gonova_document_parser_spark.operators.multimodal import media_features

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: render sf0.001 documents into a web corpus, run the
    stage-fused classify->route->extract->merge operator, return summary."""
    docs = _docs(spark, "/root/testdata/sf0.001")
    pages = pages_from_documents(docs)
    ext = extract_pages(pages)
    return ext.select(
        "url", "page_type", "n_blocks", "success",
        F.length("extracted_text").alias("text_len"),
    )


# --------------------------------------------------------------------------
# queries: (spark, sf_dir) -> DataFrame
# --------------------------------------------------------------------------

def _q_extract_pipeline(spark, sf_dir):
    """M1+A1+C1 fused pipeline — oracle-checked: the DuckDB side rebuilds
    the expected extracted text closed-form (see oracle_sql), so the
    byte-identical-per-url contract is hard-verified by the driver."""
    ext = extract_pages(pages_from_documents(_docs(spark, sf_dir)))
    return ext.select(
        "url",
        "page_type",
        "extracted_text",
        "n_blocks",
        "success",
        F.coalesce("error", F.lit("")).alias("error"),
    )


def _q_classify_counts(spark, sf_dir):
    d = _docs(spark, sf_dir)
    page_type = (
        F.when(F.col("n_chars") < 50, "scanned")
        .when(F.col("n_chars") < 200, "short")
        .otherwise("native")
    )
    return (
        d.select(page_type.alias("page_type"))
        .groupBy("page_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _q_native_ratio(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.groupBy("lang").agg(
        F.round(F.avg(F.when(F.col("n_chars") >= 50, 1.0).otherwise(0.0)), 6).alias(
            "native_ratio"
        )
    )


def _q_route_breakdown(spark, sf_dir):
    # grafted router.py:41-89 decision table: low-text -> nanonets
    # (handwriting-ish), zh -> deepseek-ocr (low native ratio), default deepseek
    d = _docs(spark, sf_dir)
    route = (
        F.when(F.col("n_chars") < 50, "nanonets")
        .when(F.col("lang") == "zh", "deepseek-ocr")
        .otherwise("deepseek")
    )
    return d.select(route.alias("route")).groupBy("route").agg(
        F.count(F.lit(1)).alias("c")
    )


def _q_recent_jobs_topk(spark, sf_dir):
    e = _events(spark, sf_dir)
    return (
        e.orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(100)
        .select(
            "event_id",
            F.date_format("ts", _TS_FMT_SPARK).alias("ts_str"),
            "event_type",
            F.round("value", 4).alias("value_r"),
        )
    )


def _q_ordered_merge(spark, sf_dir):
    d = _docs(spark, sf_dir)
    merged = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
            lambda x: x["text"],
        ),
        "\n\n---\n\n",
    )
    return d.groupBy("source").agg(merged.alias("merged"))


def _q_merge_page_markers(spark, sf_dir):
    # exact A1 byte format: "<!-- Page n -->\n\n{text}" joined "\n\n---\n\n"
    d = _docs(spark, sf_dir)
    return (
        d.groupBy("source")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "text"))).alias("arr"))
        .select(
            "source",
            F.array_join(
                F.transform(
                    "arr",
                    lambda x, i: F.concat(
                        F.lit("<!-- Page "),
                        (i + 1).cast("string"),
                        F.lit(" -->\n\n"),
                        x["text"],
                    ),
                ),
                "\n\n---\n\n",
            ).alias("merged"),
        )
    )


def _q_status_stats(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _q_cleanup_old(spark, sf_dir):
    e = _events(spark, sf_dir)
    return (
        e.where(F.col("ts") < F.lit("2024-06-01").cast("timestamp"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_deleted"))
    )


def _q_events_hourly(spark, sf_dir):
    e = _events(spark, sf_dir)
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), _TS_FMT_SPARK).alias("hour_str"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("c"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


def _q_top_users_by_value(spark, sf_dir):
    e = _events(spark, sf_dir)
    return (
        e.groupBy("user_id")
        .agg(F.round(F.sum("value"), 4).alias("total_value"), F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.desc("total_value"), F.col("user_id"))
        .limit(50)
    )


def _q_pricing_summary(spark, sf_dir):
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        l.where(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _q_nation_revenue(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def _q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join + agg + top-k — exercises join ordering,
    date predicate pushdown into all three scans, and TakeOrderedAndProject.
    customer is the broadcast side; orders/lineitem co-shuffle on orderkey.
    (The synthetic orders table carries o_orderpriority, standing in for
    Q3's o_shippriority.)"""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    # NTZ cast so the comparison stays on the column type and the
    # predicate pushes into the parquet scan (a TZ cast would wrap the column)
    cutoff = F.lit("1995-03-15").cast("timestamp_ntz")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        F.col("o_orderdate") < cutoff
    )
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
        F.col("l_shipdate") > cutoff
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


def _q_dedup_exact(spark, sf_dir):
    return exact_dup_groups(_docs(spark, sf_dir)).select("fp", "n_dups", "keeper")


def _q_dedup_ngram_jaccard(spark, sf_dir):
    # hot-shingle cap ON (default): a shingle in d docs makes d^2/2 join rows
    return ngram_jaccard_pairs(
        _docs(spark, sf_dir), n=3, threshold=0.5, max_docs_per_shingle=1000
    )


def _q_minhash_lsh_pairs(spark, sf_dir):
    # affine-hash variant: DuckDB reproduces shingle -> one md5 -> 32
    # affine minhashes (mod 2^31-1) -> band hashes -> bucket-join
    # candidates bit-for-bit (hard oracle row) at ~32x fewer md5 calls
    # than the r2 md5-per-i variant; the xxhash64 production variant is
    # exercised by minhash_lsh_verified and benched as minhash_lsh_prod
    return minhash_lsh_candidates(_docs(spark, sf_dir), hash_fn="affine").orderBy(
        "id_a", "id_b"
    )


def _q_minhash_lsh_verified(spark, sf_dir):
    # LSH candidates -> exact-Jaccard verify: the scale-path dedup pipeline.
    # Oracle invariant: on this corpus LSH recall at 0.5 is 1, so the output
    # equals the exact n-gram Jaccard method (checked in DuckDB).
    from gonova_document_parser_spark.functions.dedup import minhash_lsh_verified

    return minhash_lsh_verified(
        _docs(spark, sf_dir), n=3, threshold=0.5, max_docs_per_shingle=1000
    )


def _q_simhash(spark, sf_dir):
    # md5-hash variant: bit-for-bit reproducible in DuckDB (hard oracle row);
    # production xxhash64 variant is pytest-pinned in tests/test_functions.py
    return simhash64(_docs(spark, sf_dir), hash_fn="md5")


def _q_token_count_stats(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.groupBy("lang").agg(
        F.sum(token_count_expr("text")).alias("total_tokens"),
        F.round(F.avg(token_count_expr("text")), 6).alias("avg_tokens"),
    )


def _q_quality_scores(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select("doc_id", quality_score_expr("text").alias("qscore"))


def _q_lang_id_counts(spark, sf_dir):
    # heavy per-row stopword filters over a compacted (1-task) scan:
    # fan_out parallelizes, no-op when the scan already has enough tasks.
    # UNCONDITIONAL spread (no min_bytes): lang_id_expr runs four
    # higher-order stopword filters per row — interpreted, not codegen —
    # so even a 1.5 MB input is cheaper to shuffle than to score on one
    # task (measured 0.53 s spread vs 0.91 s single-task, round 6)
    from gonova_document_parser_spark.plans.partitioning import fan_out

    d = fan_out(_docs(spark, sf_dir))
    return (
        d.select(F.col("lang").alias("lang_true"), lang_id_expr("text").alias("lang_pred"))
        .groupBy("lang_true", "lang_pred")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _q_doc_fingerprints(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select("doc_id", F.md5(normalized_text_expr("text")).alias("fp"))


def _q_salted_counts(spark, sf_dir):
    # two-level salted aggregation == plain group count (skew pattern demo)
    d = _docs(spark, sf_dir).withColumn(
        "salt", F.pmod(F.xxhash64("doc_id"), F.lit(16)).cast("int")
    )
    return (
        d.groupBy("source", "salt")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("source")
        .agg(F.sum("c").alias("n_docs"))
    )


def _q_emb_topk_cosine(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return brute_force_topk(emb, [float(v) for v in q], k=20)


def _q_ann_topk_lsh(spark, sf_dir):
    # integer-quantized variant: bucket sign tests are exact integer math,
    # so the candidate set (and result) is engine-reproducible — hard
    # DuckDB oracle.  Float-hyperplane variants (expression + numpy paths,
    # recall@10 0.95 measured) remain for production and are pytest-pinned.
    from gonova_document_parser_spark.functions.similarity import (
        ann_topk_lsh_quantized,
    )

    emb = _emb(spark, sf_dir)
    q = [float(v) for v in emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]]
    return ann_topk_lsh_quantized(emb, q, dim=len(q), k=10, n_tables=16, n_planes=4)


def _q_bpe_token_stats(spark, sf_dir):
    """Per-language BPE-ish token budget (GPT-2-style pre-tokenizer regex,
    RE2-safe so DuckDB runs the identical pattern)."""
    from gonova_document_parser_spark.functions.textstats import bpe_token_count_expr
    from gonova_document_parser_spark.plans.partitioning import (
        EXPR_FANOUT_MIN_BYTES,
        fan_out,
    )

    d = fan_out(_docs(spark, sf_dir), min_bytes=EXPR_FANOUT_MIN_BYTES)  # heavy per-row regex over 1-file scan
    return d.groupBy("lang").agg(
        F.sum(bpe_token_count_expr("text")).alias("total_bpe"),
        F.round(F.avg(bpe_token_count_expr("text")), 6).alias("avg_bpe"),
    )


def _q_gopher_filter(spark, sf_dir):
    """Gopher-rule curation gate: per-doc booleans for the word-count,
    mean-word-length, symbol-ratio, and alpha-word rules plus the combined
    keep decision — every comparison is integer-count arithmetic, so the
    booleans are engine-exact."""
    from gonova_document_parser_spark.functions.textstats import gopher_flags
    from gonova_document_parser_spark.plans.partitioning import (
        EXPR_FANOUT_MIN_BYTES,
        fan_out,
    )

    d = fan_out(_docs(spark, sf_dir), min_bytes=EXPR_FANOUT_MIN_BYTES)
    f = gopher_flags("text")
    return d.select(
        "doc_id",
        f["n_words"].alias("n_words"),
        f["flag_word_count"].alias("flag_word_count"),
        f["flag_mean_word_len"].alias("flag_mean_word_len"),
        f["flag_symbol_ratio"].alias("flag_symbol_ratio"),
        f["flag_alpha_words"].alias("flag_alpha_words"),
        f["keep"].alias("keep"),
    )


def _q_emb_neardups_lsh(spark, sf_dir):
    """Embedding near-dup pairs at scale: quantized-LSH bucket equi-join ->
    exact cosine verify.  Deterministic duplicates (vec_id < 50 copied at
    +1,000,000) guarantee the operator has true positives to find; bucket
    bits are exact integer math, so the candidate set AND the verified
    pairs are bit-reproducible in DuckDB (hard oracle)."""
    from gonova_document_parser_spark.functions.similarity import emb_neardups_lsh

    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    dup = emb.where(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    return emb_neardups_lsh(emb.unionByName(dup), dim=64, threshold=0.99)


def _q_result_lookup(spark, sf_dir):
    # K4 result endpoint analog: point lookup is a predicate-pushed scan
    d = _docs(spark, sf_dir)
    return d.where(F.col("doc_id").isin([7, 42, 123])).select(
        "doc_id", "text", "lang"
    )


def _q_simhash_neardups(spark, sf_dir):
    from gonova_document_parser_spark.functions.dedup import simhash_neardup_pairs

    # md5 variant -> DuckDB reproduces the full band/verify pipeline
    return simhash_neardup_pairs(
        _docs(spark, sf_dir), max_hamming=3, bands=4, hash_fn="md5"
    )


def _q_curation_filter(spark, sf_dir):
    """Composed curation pipeline: quality gate + lang gate + exact dedup —
    the per-source count of documents a training pipeline would keep."""
    d = _docs(spark, sf_dir)
    scored = d.select(
        "doc_id",
        "source",
        quality_score_expr("text").alias("q"),
        lang_id_expr("text").alias("lp"),
        F.md5(normalized_text_expr("text")).alias("fp"),
    )
    keep_one = scored.groupBy("fp").agg(F.min("doc_id").alias("keeper"))
    return (
        scored.join(keep_one, scored["doc_id"] == keep_one["keeper"])
        .where((F.col("q") >= 0.3) & (F.col("lp") == "en"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


def _q_pii_scrub(spark, sf_dir):
    """PII detect+redact over deterministically PII-augmented text: the
    synthetic corpus has no contact info, so both engines append the same
    email/phone/IP suffix per doc — the scrub transformation is verified
    non-trivially (md5 of redacted text must match DuckDB byte-for-byte)."""
    from gonova_document_parser_spark.functions.pii import (
        pii_counts,
        scrub_pii_expr,
    )

    d = _docs(spark, sf_dir)
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1 (555) 010-01"),
        F.col("doc_id").cast("string"),
        F.lit(" via 192.168.0.1 now"),
    )
    counts = pii_counts(aug)
    return d.select(
        "doc_id",
        counts["n_emails"].alias("n_emails"),
        counts["n_ips"].alias("n_ips"),
        counts["n_phones"].alias("n_phones"),
        F.md5(scrub_pii_expr(aug)).alias("scrubbed_md5"),
    )


def _q_repetition_stats(spark, sf_dir):
    """Gopher-style within-doc token-repetition quality signal."""
    from gonova_document_parser_spark.functions.pii import repetition_ratio_expr

    d = _docs(spark, sf_dir)
    return d.select("doc_id", repetition_ratio_expr("text").alias("rep_ratio"))


def _q_line_dedup(spark, sf_dir):
    """CCNet-style line-level boilerplate removal: documents are
    deterministically rendered into 8-word lines with planted boilerplate
    (a cookie header on doc_id%3==0, a subscribe footer on doc_id%2==0);
    lines occurring in >5 distinct docs are dropped and each document is
    reassembled in original line order.  The oracle replays the identical
    rendering + hot-line count + reassembly in DuckDB, so drop semantics
    AND order preservation are hash-verified on full text bytes."""
    from gonova_document_parser_spark.functions.lines import line_dedup

    d = _docs(spark, sf_dir)
    broken = F.regexp_replace(
        normalized_text_expr("text"), r"((\S+ ){7}\S+) ", "$1\n"
    )
    aug = F.concat(
        F.when(
            F.col("doc_id") % 3 == 0,
            F.lit("cookie notice please accept our cookies\n"),
        ).otherwise(F.lit("")),
        broken,
        F.when(
            F.col("doc_id") % 2 == 0,
            F.lit("\nsubscribe to our newsletter today"),
        ).otherwise(F.lit("")),
    )
    return line_dedup(d.select("doc_id", aug.alias("text")), max_docs=5)


# closed-form host-graph edge list of the rendered-pages corpus with the
# planted partner link (see _host_graph_df); shared by the host_graph and
# host_pagerank oracles
_HOST_EDGES_SQL = """
    WITH d AS (
        SELECT doc_id, (doc_id % 10) <= 6 AS is_html,
               'partner-' || (doc_id % 5) || '.example.net' AS ph
        FROM documents),
    edges AS (
        SELECT 'docs.example.com' AS src_host, 'docs.example.com' AS dst_host,
               (9 * COUNT(*))::BIGINT AS n_links
        FROM d WHERE is_html HAVING COUNT(*) > 0
        UNION ALL
        SELECT 'docs.example.com' AS src_host, ph AS dst_host,
               COUNT(*)::BIGINT AS n_links
        FROM d GROUP BY ph)
"""

# five unrolled integer power-iteration steps (fixed-iteration PageRank —
# identical integer recurrence to functions/webgraph.py pagerank_hosts)
_PAGERANK_ITERS_SQL = "".join(
    f""",
    pr{t + 1} AS (
        SELECT n.host,
               (150000 + COALESCE(SUM(
                   (p.r * 85 * e.n_links) // (100 * o.wsum)), 0))::BIGINT AS r
        FROM nodes n
        LEFT JOIN edges e ON e.dst_host = n.host
        LEFT JOIN outw o ON o.src_host = e.src_host
        LEFT JOIN pr{t} p ON p.host = e.src_host
        GROUP BY n.host)"""
    for t in range(5)
)


# four sliding-window docs over a synthetic vocab: adjacent windows share
# 16/24 words (3-gram Jaccard ~= 0.47 >= 0.4) but windows two apart fall
# below the threshold — a CHAIN a-b-c-d that only transitive clustering
# groups into one component (a clique-only implementation would fail).
_CHAIN_DOCS = [
    (9000000 + i, " ".join(f"c{j:02d}" for j in range(i * 8, i * 8 + 24)))
    for i in range(4)
]


def _q_dedup_clusters(spark, sf_dir):
    """Near-dup pair list -> connected components -> keep-one-per-cluster.

    Pairs come from exact n-gram Jaccard (threshold 0.4) over documents
    augmented with 10 exact clones (2-cliques) and a 4-doc sliding-window
    chain (transitivity test).  The DuckDB oracle recomputes the identical
    pair list and resolves components with a recursive CTE, hard-verifying
    label propagation, min-id cluster assignment, sizes, and keeper choice."""
    from gonova_document_parser_spark.functions.dedup import (
        dedup_clusters,
        ngram_jaccard_pairs,
    )

    d = _docs(spark, sf_dir).select("doc_id", "text")
    clones = d.where(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 5000000).alias("doc_id"), "text"
    )
    chains = spark.createDataFrame(_CHAIN_DOCS, "doc_id long, text string")
    docs = d.unionByName(clones).unionByName(chains)
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.4, max_docs_per_shingle=1000)
    return dedup_clusters(pairs)


def _q_contamination(spark, sf_dir):
    """Benchmark decontamination (13-gram rule): eval set = every 50th doc;
    the scanned corpus excludes the eval docs themselves but gains planted
    leaks (eval text behind a 3-word prefix, ids +7000000) that still share
    internal 13-grams.  The oracle recomputes eval shingles, the broadcast
    semi-join hit counts, and the zero rows in DuckDB."""
    from gonova_document_parser_spark.functions.dedup import ngram_contamination

    d = _docs(spark, sf_dir).select("doc_id", "text")
    ev = d.where(F.col("doc_id") % 50 == 0)
    leaked = ev.select(
        (F.col("doc_id") + 7000000).alias("doc_id"),
        F.concat(F.lit("zz zz zz "), F.col("text")).alias("text"),
    )
    scanned = d.where(F.col("doc_id") % 50 != 0).unionByName(leaked)
    return ngram_contamination(scanned, ev, n=13)


def _q_sample_mix(spark, sf_dir):
    """Deterministic per-source Bernoulli sampling (training-mix weights):
    integer hash-threshold per stratum, zero shuffle (pure pushed filter).
    The oracle reproduces exact MEMBERSHIP (every kept doc_id), not just
    per-source counts, via the same md5-prefix integer hash in DuckDB."""
    from gonova_document_parser_spark.functions.sampling import stratified_sample

    d = _docs(spark, sf_dir).select("doc_id", "source")
    return stratified_sample(
        d,
        rates={"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1},
        default_rate=0.05,
    )


def _q_hash_split(spark, sf_dir):
    """Deterministic train/val/test assignment by hash range — stable
    under appends (new docs never move old docs between splits).  The
    oracle recomputes every per-doc assignment from the same integer cut
    points."""
    from gonova_document_parser_spark.functions.sampling import hash_split

    d = _docs(spark, sf_dir).select("doc_id")
    return hash_split(d, {"train": 0.8, "val": 0.1, "test": 0.1})


def _q_governance_filter(spark, sf_dir):
    """Crawl-governance filters: meta-robots noindex (both attribute
    orders) + domain-suffix blocklist (subdomains blocked, label
    boundaries respected — notspam.example.net survives).  Hosts and
    noindex tags are planted deterministically; the oracle rebuilds the
    identical pages and replays the same RE2 regexes and suffix
    matching in DuckDB."""
    from gonova_document_parser_spark.functions.governance import governance_flags
    from gonova_document_parser_spark.plans.partitioning import (
        EXPR_FANOUT_MIN_BYTES,
        fan_out,
    )

    # two big (?i) regexes per row over a 1-file compacted scan
    d = fan_out(_docs(spark, sf_dir), min_bytes=EXPR_FANOUT_MIN_BYTES)
    host = (
        F.when(F.col("doc_id") % 5 == 0, F.lit("docs.example.com"))
        .when(F.col("doc_id") % 5 == 1, F.lit("sub.spam.example.net"))
        .when(F.col("doc_id") % 5 == 2, F.lit("spam.example.net"))
        .when(F.col("doc_id") % 5 == 3, F.lit("notspam.example.net"))
        .otherwise(F.lit("ads.example.org"))
    )
    meta = (
        F.when(
            F.col("doc_id") % 7 == 0,
            F.lit('<meta name="robots" content="noindex, nofollow">'),
        )
        .when(
            F.col("doc_id") % 11 == 0,
            F.lit("<meta content='NOINDEX' name=robots>"),
        )
        .otherwise(F.lit('<meta name="robots" content="index, follow">'))
    )
    pages = d.select(
        "doc_id",
        F.concat(F.lit("https://"), host, F.lit("/d/"), F.col("doc_id")).alias("url"),
        F.concat(
            F.lit("<html><head>"), meta, F.lit("</head><body>"),
            F.substring("text", 1, 80), F.lit("</body></html>"),
        ).alias("html_text"),
    )
    return governance_flags(
        pages, ["spam.example.net", "ads.example.org"]
    ).select("doc_id", "url", "noindex", "domain_blocked", "keep")


_BLOOM_M, _BLOOM_K = 1 << 16, 5


def _q_bloom_frontier(spark, sf_dir):
    """Bloom-filter frontier probe: the documents' urls build the seen
    filter; candidates mix half the seen urls with planted new ones.
    The affine (md5-seeded) hash family makes bit construction and
    probing engine-reproducible; the oracle skips the int64 packing and
    joins candidate positions against the DISTINCT set-bit positions —
    identical membership semantics, so verdicts hash-match exactly
    (false positives included)."""
    from gonova_document_parser_spark.functions.frontier import (
        frontier_probe,
        url_bloom_bits,
    )

    d = _docs(spark, sf_dir).select("doc_id")
    seen = d.select(
        F.concat(
            F.lit("https://site"), F.col("doc_id") % 20,
            F.lit(".example.org/doc"), F.col("doc_id"),
        ).alias("url")
    )
    cand = seen.where(F.col("url").endswith("0")).unionByName(
        d.where(F.col("doc_id") % 5 == 0).select(
            F.concat(F.lit("https://new.example.org/n"), F.col("doc_id")).alias(
                "url"
            )
        )
    )
    bits = url_bloom_bits(seen, _BLOOM_M, _BLOOM_K, hash_fn="affine")
    return frontier_probe(cand, bits, _BLOOM_M, _BLOOM_K, hash_fn="affine")


_FETCH_DELAYS = [
    # host, delay_sec — shared verbatim with the oracle VALUES; delays are
    # exact binary fractions so (rank-1)*delay is bit-identical cross-engine
    ("docs.example.com", 0.5),
    ("ads.example.org", 2.0),
]


def _q_frontier_schedule(spark, sf_dir):
    """Politeness-aware frontier schedule: hosts hash-assign to 8
    fetcher lanes (md5 low-60 so DuckDB replays the assignment), the
    within-host order is one row_number window (priority desc, url
    tiebreak), and ``fetch_offset_sec = (rank-1) * delay`` with two
    planted per-host crawl-delays broadcast over the default.  The
    oracle rebuilds the identical frontier and replays window + hash +
    offset closed-form."""
    from gonova_document_parser_spark.functions.frontier import schedule_frontier

    d = _docs(spark, sf_dir).select("doc_id")
    host = (
        F.when(F.col("doc_id") % 5 == 0, F.lit("docs.example.com"))
        .when(F.col("doc_id") % 5 == 1, F.lit("sub.spam.example.net"))
        .when(F.col("doc_id") % 5 == 2, F.lit("spam.example.net"))
        .when(F.col("doc_id") % 5 == 3, F.lit("notspam.example.net"))
        .otherwise(F.lit("ads.example.org"))
    )
    frontier = d.select(
        F.concat(F.lit("https://"), host, F.lit("/d/"), F.col("doc_id")).alias(
            "url"
        ),
        (F.col("doc_id") % 97).alias("priority"),
    )
    delays = spark.createDataFrame(
        _FETCH_DELAYS, "host string, delay_sec double"
    )
    return schedule_frontier(
        frontier,
        n_fetchers=8,
        default_delay_sec=1.0,
        priority_col="priority",
        delays=delays,
        hash_fn="md5",
    )


def _q_dsir_weights(spark, sf_dir):
    """DSIR hashed-n-gram importance weights toward the doc_id%10==0
    target subset (the same trusted-head convention lm_perplexity
    uses).  Affine (md5) bucketing so DuckDB replays feature hashing,
    both Laplace-smoothed bucket models, and the per-doc log-ratio sum
    closed-form; logw rounded 4dp per the cross-engine float
    contract."""
    from gonova_document_parser_spark.functions.dsir import importance_weights

    d = _docs(spark, sf_dir).select("doc_id", "text")
    w = importance_weights(
        d, F.col("doc_id") % 10 == 0, n_buckets=4096, hash_fn="affine"
    )
    return w.select(
        "doc_id", "n_feats", F.round("logw", 4).alias("logw")
    )


def _q_boilerplate(spark, sf_dir):
    """Per-line boilerplate stripping over synthetic full pages: every
    document's text is wrapped in planted furniture (nav bar, cookie
    banner, a per-doc-varying subscribe-shout or prose line, copyright
    footer).  The oracle replays the identical line verdict — same
    regexes, same stopword list, same 0.5 upper-ratio arithmetic — via
    DuckDB list lambdas, so kept-line sets and the reassembled clean
    text prefix hash-match exactly."""
    from gonova_document_parser_spark.functions.boilerplate import (
        strip_boilerplate,
    )

    d = _docs(spark, sf_dir).select(
        "doc_id", F.coalesce("text", F.lit("")).alias("text")
    )
    page = d.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.lit("Home | About | Contact"),
            F.lit(
                "We use cookies to improve your browsing experience on this site."
            ),
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit("SUBSCRIBE NOW TO OUR NEWSLETTER TODAY"),
            ).otherwise(
                F.lit(
                    "Read the documentation for more details about the parser here."
                )
            ),
            F.lit("© 2026 Example Corp. All rights reserved."),
        ).alias("text"),
    )
    return strip_boilerplate(page).select(
        "doc_id",
        "n_lines",
        "n_kept",
        F.length("clean_text").alias("clean_len"),
        F.substring("clean_text", 1, 80).alias("clean_head"),
    )


def _q_anchor_texts(spark, sf_dir):
    """Anchor-text aggregation (what the web calls each target): planted
    link edges with empty anchors, exact ties, and a hot 'home' anchor;
    two hash aggregations, deterministic struct-max tiebreak — the
    oracle replays both levels with a window argmax."""
    from gonova_document_parser_spark.functions.webgraph import anchor_text_agg

    d = _docs(spark, sf_dir).select("doc_id")
    links = d.select(
        F.concat(
            F.lit("https://site"), F.col("doc_id") % 20,
            F.lit(".example.org/page"), F.col("doc_id") % 50,
        ).alias("target"),
        (
            F.when(F.col("doc_id") % 5 == 0, F.lit(""))
            .when(F.col("doc_id") % 5 == 1, F.lit("home"))
            .when(F.col("doc_id") % 5 == 2, F.lit("read more"))
            .when(
                F.col("doc_id") % 5 == 3,
                F.concat(F.lit("docs "), F.col("doc_id") % 3),
            )
            .otherwise(F.lit("home"))
        ).alias("anchor"),
    )
    return anchor_text_agg(links)


def _q_lm_perplexity(spark, sf_dir):
    """CCNet-paradigm LM quality score: an interpolated bigram model
    (lam * ML bigram + (1-lam) * Laplace unigram) trains on the head
    subset (doc_id % 10 == 0, standing in for the trusted reference
    corpus) and scores every document's average negative log-prob.
    The oracle replays training AND scoring closed-form; (1-lam) is
    written as the SAME IEEE subtraction (1.0 - 0.9) on both engines."""
    from gonova_document_parser_spark.functions.lm import lm_perplexity_scores

    d = _docs(spark, sf_dir).select("doc_id", "text")
    return lm_perplexity_scores(d, F.col("doc_id") % 10 == 0, lam=0.9)


_ROBOTS_RULES = [
    # host, agent, allow, pattern — shared verbatim with the oracle VALUES
    ("docs.example.com", "*", False, "/private/"),
    ("docs.example.com", "*", True, "/private/pub/"),
    ("docs.example.com", "*", False, "/raw*.bin"),
    ("docs.example.com", "*", False, "/exact$"),
    ("api.example.com", "*", False, "/"),
    ("api.example.com", "gonovabot", False, "/internal/"),
    ("closed.example.net", "*", False, "/"),
]


def _q_robots_filter(spark, sf_dir):
    """robots.txt allow/disallow verdicts (RFC 9309): longest-match with
    allow-wins ties, ``*``/``$`` pattern extensions, and agent-group
    shadowing (gonovabot's own group on api.example.com hides that
    host's ``Disallow: /`` entirely).  Hosts/paths are planted by doc_id
    residue; the oracle rebuilds the same pages AND replays the generic
    evaluator — identical regex compilation chain, window argmax — not a
    per-residue closed form."""
    from gonova_document_parser_spark.functions.robots import robots_verdict

    d = _docs(spark, sf_dir).select("doc_id")
    host = (
        F.when(F.col("doc_id") % 4 == 0, F.lit("docs.example.com"))
        .when(F.col("doc_id") % 4 == 1, F.lit("api.example.com"))
        .when(F.col("doc_id") % 4 == 2, F.lit("closed.example.net"))
        .otherwise(F.lit("norules.example.io"))
    )
    path = (
        F.when(F.col("doc_id") % 7 == 0, F.concat(F.lit("/private/doc"), "doc_id"))
        .when(F.col("doc_id") % 7 == 1, F.concat(F.lit("/private/pub/doc"), "doc_id"))
        .when(F.col("doc_id") % 7 == 2, F.concat(F.lit("/raw"), "doc_id", F.lit(".bin")))
        .when(F.col("doc_id") % 7 == 3, F.lit("/exact"))
        .when(F.col("doc_id") % 7 == 4, F.concat(F.lit("/exactly"), "doc_id"))
        .when(F.col("doc_id") % 7 == 5, F.concat(F.lit("/internal/doc"), "doc_id"))
        .otherwise(F.concat(F.lit("/ok/doc"), "doc_id"))
    )
    pages = d.select(
        "doc_id", F.concat(F.lit("https://"), host, path).alias("url")
    )
    rules = spark.createDataFrame(
        _ROBOTS_RULES, "host string, agent string, allow boolean, pattern string"
    )
    return robots_verdict(pages, rules, crawler="gonovabot")


def _q_script_stats(spark, sf_dir):
    """Writing-script composition with planted multilingual suffixes
    (Cyrillic / Arabic / CJK appended by doc_id residue) — dominant
    script, per-script codepoint counts, and the mixed-script spam flag,
    all from literal codepoint ranges both engines run verbatim."""
    from gonova_document_parser_spark.functions.textstats import script_stats
    from gonova_document_parser_spark.plans.partitioning import (
        EXPR_FANOUT_MIN_BYTES,
        fan_out,
    )

    d = fan_out(_docs(spark, sf_dir), min_bytes=EXPR_FANOUT_MIN_BYTES)  # 5 regex counts/row over a 1-file scan
    suffix = (
        F.when(F.col("doc_id") % 9 == 1, F.lit(" привет мир данные корпус"))
        .when(F.col("doc_id") % 9 == 2, F.lit(" مرحبا بالعالم نص عربي"))
        .when(F.col("doc_id") % 9 == 3, F.lit(" 東京 大阪 データ 코퍼스"))
        .otherwise(F.lit(""))
    )
    mutated = d.select(
        "doc_id", F.concat(F.col("text"), suffix).alias("text")
    )
    return script_stats(mutated)


def _q_rare_words(spark, sf_dir):
    """Rare-word (OOV/noisiness) quality signal: fraction of each doc's
    tokens whose corpus-wide occurrence count is <= 2.  Zipf makes the
    COMMON vocab the small side, so rarity is a broadcast-join miss; the
    oracle recomputes corpus counts and per-doc ratios exactly."""
    from gonova_document_parser_spark.functions.textstats import rare_word_stats

    return rare_word_stats(_docs(spark, sf_dir), max_count=2)


_DELTA_TWIN_TEXT = (
    "delta twin content repeated for shingles alpha beta gamma delta epsilon zeta"
)


def _q_incr_dedup(spark, sf_dir):
    """Incremental near-dup dedup of a crawl delta against the corpus's
    persisted minhash band store — the corpus is NEVER re-shingled.
    Planted delta: exact copies of doc_id<10 (must match the store),
    two identical fresh twins (the larger flags dup_in_delta on the
    smaller), and 8 genuinely novel docs (must keep).  The affine
    minhash family makes the whole pipeline — store bands, delta bands,
    both joins, min-representative selection — DuckDB-reproducible."""
    from gonova_document_parser_spark.functions.dedup import (
        incremental_minhash_dedup,
        minhash_bands,
    )

    d = _docs(spark, sf_dir).select("doc_id", "text")
    store = minhash_bands(d, hash_fn="affine")
    copies = d.where(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 9200000).alias("doc_id"), "text"
    )
    twins = spark.createDataFrame(
        [(9300000, _DELTA_TWIN_TEXT), (9300001, _DELTA_TWIN_TEXT)],
        "doc_id long, text string",
    )
    # every word carries the doc id, so fresh docs share ZERO shingles with
    # the store or each other — no LSH band can legitimately match
    sid = F.col("doc_id").cast("string")
    fresh = d.where(F.col("doc_id") < 8).select(
        (F.col("doc_id") + 9400000).alias("doc_id"),
        F.concat(
            F.lit("novel"), sid, F.lit(" delta"), sid,
            F.lit(" document"), sid, F.lit(" unique"), sid,
            F.lit(" words"), sid, F.lit(" qq"), sid,
        ).alias("text"),
    )
    delta = copies.unionByName(twins).unionByName(fresh)
    verdicts, _ = incremental_minhash_dedup(delta, store, hash_fn="affine")
    return verdicts


def _q_crawl_diff(spark, sf_dir):
    """Snapshot diff between the corpus and a deterministically mutated
    re-crawl: doc_id%13==0 disappears (removed), doc_id%11==0 gets a
    changed body, ids+9100000 for doc_id<10 are new fetches (added),
    everything else is a reformat-only refetch (extra whitespace —
    must read UNCHANGED through normalization).  One full-outer join on
    16-byte fingerprints; DuckDB replays it exactly."""
    from gonova_document_parser_spark.functions.diff import crawl_diff

    # NO fan_out here: the query derives THREE branches from the base
    # (old/mutated/added), so a pre-repartition triples into three
    # shuffles (measured 0.47 s -> 1.55 s), while the md5 projection is
    # light and the full-outer join provides its own exchanges anyway
    d = _docs(spark, sf_dir).select("doc_id", "text")
    url = F.concat(F.lit("https://docs.example.com/d/"), F.col("doc_id"))
    old = d.select(url.alias("url"), "text")
    mutated = (
        d.where(F.col("doc_id") % 13 != 0)
        .select(
            url.alias("url"),
            F.when(
                F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" refetched"))
            )
            .otherwise(F.concat(F.lit("  "), F.col("text"), F.lit("\n")))
            .alias("text"),
        )
    )
    added = d.where(F.col("doc_id") < 10).select(
        F.concat(F.lit("https://docs.example.com/d/"), F.col("doc_id") + 9100000).alias(
            "url"
        ),
        F.col("text"),
    )
    return crawl_diff(old, mutated.unionByName(added))


def _q_seq_pack(spark, sf_dir):
    """Token-budget sequence packing (GPT-style concatenate-then-slice):
    each doc's chunk_id is the training sequence where its token stream
    starts.  The engine runs the two-phase scalable prefix sum
    (range-repartition, per-partition sums, driver prefix offsets, one
    within-partition window); the oracle is the mathematically equal
    single cumulative window in DuckDB — hash-exact offsets prove the
    distributed prefix sum correct."""
    from gonova_document_parser_spark.functions.sampling import pack_sequences

    return pack_sequences(_docs(spark, sf_dir), budget=2048, n_partitions=8)


def _q_dup_spans(spark, sf_dir):
    """Cross-doc duplicated-span coverage (exact-substring dedup signal):
    documents plus planted partial copies (first 20 words of every
    doc_id<15, ids +8000000).  The oracle recomputes hashed 10-token
    windows, the >=2-distinct-docs duplicate set, and the interval-union
    token coverage per doc in DuckDB — hash-exact including the zeros."""
    from gonova_document_parser_spark.functions.dedup import duplicated_spans
    from gonova_document_parser_spark.functions.textstats import tokens_expr

    d = _docs(spark, sf_dir).select("doc_id", "text")
    partial = d.where(F.col("doc_id") < 15).select(
        (F.col("doc_id") + 8000000).alias("doc_id"),
        F.array_join(F.slice(tokens_expr("text"), 1, 20), " ").alias("text"),
    )
    return duplicated_spans(d.unionByName(partial), window=10)


def _q_remove_dup_spans(spark, sf_dir):
    """Exact-substring corpus surgery over the same planted-copy corpus as
    dup_spans: every duplicated 10-token window keeps its first
    occurrence corpus-wide (min (doc_id, pos)) and loses every other
    occurrence's covered tokens.  The oracle replays first-occurrence
    selection (ROW_NUMBER over (wh ORDER BY doc_id, pos)), the per-doc
    duplicate-start list, and the indexed token filter in DuckDB —
    byte-exact clean_text including untouched docs."""
    from gonova_document_parser_spark.functions.dedup import remove_duplicated_spans
    from gonova_document_parser_spark.functions.textstats import tokens_expr

    d = _docs(spark, sf_dir).select("doc_id", "text")
    partial = d.where(F.col("doc_id") < 15).select(
        (F.col("doc_id") + 8000000).alias("doc_id"),
        F.array_join(F.slice(tokens_expr("text"), 1, 20), " ").alias("text"),
    )
    return remove_duplicated_spans(d.unionByName(partial), window=10)


def _host_graph_df(spark, sf_dir):
    """Rendered pages -> host link graph, with one planted cross-host link
    per page (partner-(doc_id%5).example.net) appended to the html string.
    The engine must genuinely regex-parse hrefs out of rendered bytes; the
    oracle knows the render's closed form (9 boilerplate links per html
    page, 0 for pdf/scanned, +1 planted external for every page)."""
    from gonova_document_parser_spark.corpus import pages_from_documents
    from gonova_document_parser_spark.functions.webgraph import outlink_host_graph

    pages = pages_from_documents(_docs(spark, sf_dir))
    num = F.regexp_extract("url", r"/d/(\d+)$", 1).cast("long")
    html_str = F.concat(
        F.decode("html", "UTF-8"),
        F.lit('<a href="https://partner-'),
        (num % 5).cast("string"),
        F.lit('.example.net/x">p</a>'),
    )
    return outlink_host_graph(pages.select("url", html_str.alias("html_text")))


def _q_host_graph(spark, sf_dir):
    return _host_graph_df(spark, sf_dir)


def _q_host_pagerank(spark, sf_dir):
    """Integer-exact fixed-iteration PageRank over the extracted host
    graph — no float anywhere, so the DuckDB oracle (5 unrolled
    power-iteration CTEs over the closed-form edge list) matches
    bit-for-bit."""
    from gonova_document_parser_spark.functions.webgraph import pagerank_hosts

    return pagerank_hosts(_host_graph_df(spark, sf_dir), iters=5)


def _q_top_ngrams(spark, sf_dir):
    """Corpus-wide most-frequent trigram listing (vocab/statistics prep):
    one groupBy(shingle) count, then a top-50 with a deterministic
    shingle tiebreak — compiles to TakeOrderedAndProject (per-partition
    heaps), NOT a full sort."""
    from gonova_document_parser_spark.functions.dedup import shingles

    sh = shingles(_docs(spark, sf_dir), n=3, distinct=False)
    return (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("shingle").asc())
        .limit(50)
    )


def _q_domain_cap(spark, sf_dir):
    """Anti-domination quota: keep at most 10 docs per source, ranked by
    quality score (doc_id tiebreak).  The oracle replays the identical
    ROW_NUMBER window in DuckDB — exact kept-set membership, which also
    re-verifies cross-engine ordering of the rounded quality doubles."""
    from gonova_document_parser_spark.functions.sampling import domain_cap

    d = _docs(spark, sf_dir)
    scored = d.select(
        "doc_id",
        "source",
        F.round(quality_score_expr("text"), 6).alias("q"),
    )
    return domain_cap(scored, 10, key_col="source", order_col="q")


def _q_latest_snapshot(spark, sf_dir):
    """Crawl re-fetch dedup analog: keep only the newest row per key
    (user_id, event_type) — row_number window, one shuffle, deterministic
    event_id tiebreak.  The oracle replays the identical window in
    DuckDB, verifying exactly which snapshot survives per key."""
    from gonova_document_parser_spark.functions.dedup import latest_snapshot

    e = _events(spark, sf_dir)
    out = latest_snapshot(
        e, ["user_id", "event_type"], ts_col="ts", tiebreak_col="event_id"
    )
    return out.select(
        "event_id",
        "user_id",
        "event_type",
        F.date_format("ts", _TS_FMT_SPARK).alias("ts_s"),
        F.round("value", 2).alias("value"),
    )


def _q_url_canonical_dedup(spark, sf_dir):
    """URL canonicalization collapse: deterministically messy urls (case,
    www., default port, utm params, fragments) built identically in both
    engines reduce to canonical families; counts per family verify the
    whole normalization chain."""
    from gonova_document_parser_spark.functions.urls import canonical_url_expr

    d = _docs(spark, sf_dir)
    messy = F.concat(
        F.lit("HTTPS://WWW.Docs.Example.COM:443/d/"),
        (F.col("doc_id") % 20).cast("string"),
        F.lit("?utm_source=crawl&page="),
        (F.col("doc_id") % 4).cast("string"),
        F.lit("&utm_campaign=x#sec"),
        F.col("doc_id").cast("string"),
    )
    return (
        d.select(canonical_url_expr(messy).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _q_token_histogram(spark, sf_dir):
    d = _docs(spark, sf_dir)
    bucket = (F.floor(token_count_expr("text") / 10) * 10).cast("long")
    return d.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("c")
    )


def _q_graph_nodes(spark, sf_dir):
    # A2 graph build: merged-with-markers per source -> one row per page node
    from gonova_document_parser_spark.operators.graph import nodes_expr

    m = _q_merge_page_markers(spark, sf_dir)
    node = F.explode(nodes_expr("merged")).alias("node")
    return m.select("source", node).select(
        "source",
        F.col("node.id").alias("node_id"),
        F.col("node.type").alias("node_type"),
        F.col("node.page").alias("page"),
        F.col("node.content").alias("content"),
    )


def _q_graph_edges_count(spark, sf_dir):
    from gonova_document_parser_spark.operators.graph import edges_expr

    m = _q_merge_page_markers(spark, sf_dir)
    return m.select(
        "source", F.size(edges_expr("merged")).alias("n_edges")
    )


def _q_signature_flags(spark, sf_dir):
    from gonova_document_parser_spark.functions.signatures import has_signature_expr

    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id", has_signature_expr("text").cast("int").alias("has_sig")
    )


def _q_route_explain(spark, sf_dir):
    # C5 routing explainer over real page payloads (rows-only: analyzer
    # probes binary structure, not SQL-expressible)
    from gonova_document_parser_spark.operators.analyze import (
        analyze_pages,
        explain_routing,
    )

    pages = pages_from_documents(_docs(spark, sf_dir))
    return (
        explain_routing(analyze_pages(pages))
        .groupBy("route", "route_reason")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _q_analyzer_stats(spark, sf_dir):
    from gonova_document_parser_spark.operators.analyze import analyze_pages

    pages = pages_from_documents(_docs(spark, sf_dir))
    return (
        analyze_pages(pages)
        .groupBy("page_type")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.round(F.avg("text_layer_chars"), 2).alias("avg_text_chars"),
            F.sum(F.col("has_images").cast("long")).alias("n_with_images"),
        )
    )


def _q_doc_embeddings(spark, sf_dir):
    # M9 embedding plumbing with the cross-engine-verifiable stub encoder:
    # component j = sha256(text) byte j / 255, so DuckDB reproduces the
    # vector exactly.  byte_sum recovers each float32 component back to its
    # integer byte (round(x*255)) before summing — integer-exact, no float
    # rounding hazard across engines.
    from gonova_document_parser_spark.functions.embeddings import (
        embed_expr,
        oracle_encode,
    )

    d = _docs(spark, sf_dir)
    emb = d.select(
        "doc_id", embed_expr("text", encoder=oracle_encode).alias("embedding")
    )
    byte_sum = F.aggregate(
        F.transform(F.col("embedding"), lambda x: F.round(x * 255, 0).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return emb.select(
        "doc_id",
        F.size("embedding").alias("dim"),
        byte_sum.alias("byte_sum"),
    )


def _ivf_index_path(sf_dir: str) -> str:
    """Index location keyed by a CONTENT digest of the embeddings input.

    Two different corpora (or two versions of one corpus) hash to different
    paths, so concurrent drivers and stale indexes can never cross-serve;
    mutating a single embedding value changes the path
    (tests/test_functions.py::test_ivf_index_path_keyed_by_content).
    """
    import os
    import tempfile

    from gonova_document_parser_spark.functions.similarity import (
        input_content_digest,
    )

    digest = input_content_digest(os.path.join(sf_dir, "embeddings.parquet"))
    return os.path.join(tempfile.gettempdir(), f"gonova_ivf_{digest}")


def _ensure_ivf_index(spark, sf_dir: str, n_cells: int = 16) -> str:
    """Materialize the IVF index for ``sf_dir`` if absent; return its path.

    Build goes into a pid-suffixed temp dir then renames into place, so a
    concurrent builder on the same host either wins the rename or discards
    its copy — readers only ever see a fully-committed index (the
    ``_COMPLETE`` marker is written before the rename).
    """
    import os
    import shutil

    from gonova_document_parser_spark.functions.similarity import (
        ivf_index_ready,
        ivf_materialize,
    )

    path = _ivf_index_path(sf_dir)
    if ivf_index_ready(path):
        return path
    tmp = f"{path}.build-{os.getpid()}"
    ivf_materialize(_emb(spark, sf_dir), tmp, n_cells=n_cells)
    try:
        os.rename(tmp, path)
    except OSError:  # lost the race: another builder committed first
        shutil.rmtree(tmp, ignore_errors=True)
    return path


def _semdedup_vectors(spark, sf_dir):
    """Embeddings augmented with planted semantic duplicates (double-cast).

    Clones (vec_id+1_000_000 for vec_id<50, cosine exactly 1.0 with their
    source) and jitter twins (vec_id+2_000_000 for 50<=vec_id<100,
    element 0 scaled by 1.1 — cosine ~0.999, a near- but not exact dup).
    Deterministic column math only; the oracle never rebuilds these — it
    reads the materialized index this frame feeds."""
    emb = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    clones = emb.where(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    twins = emb.where((F.col("vec_id") >= 50) & (F.col("vec_id") < 100)).select(
        (F.col("vec_id") + 2000000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i == 0, x * 1.1).otherwise(x),
        ).alias("embedding"),
    )
    return emb.unionByName(clones).unionByName(twins)


def _semdedup_index_path(sf_dir: str) -> str:
    """Like _ivf_index_path but for the dup-augmented SemDeDup corpus —
    separate prefix so the two indexes never cross-serve."""
    import os
    import tempfile

    from gonova_document_parser_spark.functions.similarity import (
        input_content_digest,
    )

    digest = input_content_digest(os.path.join(sf_dir, "embeddings.parquet"))
    return os.path.join(tempfile.gettempdir(), f"gonova_semdedup_{digest}")


def _ensure_semdedup_index(spark, sf_dir: str, n_cells: int = 16) -> str:
    """Materialize the SemDeDup cluster index if absent (same atomic
    tmp-build + rename + _COMPLETE-marker discipline as _ensure_ivf_index)."""
    import os
    import shutil

    from gonova_document_parser_spark.functions.similarity import (
        ivf_index_ready,
        ivf_materialize,
    )

    path = _semdedup_index_path(sf_dir)
    if ivf_index_ready(path):
        return path
    tmp = f"{path}.build-{os.getpid()}"
    ivf_materialize(_semdedup_vectors(spark, sf_dir), tmp, n_cells=n_cells)
    try:
        os.rename(tmp, path)
    except OSError:  # lost the race: another builder committed first
        shutil.rmtree(tmp, ignore_errors=True)
    return path


def _q_semantic_dedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023) over the materialized cluster index:
    a vector is dropped iff a smaller-id vector in the SAME KMeans cell
    has 4dp cosine >= 0.95.  Planted exact clones and jitter twins land
    in their source's cell (identical/near-identical vectors quantize
    together) and must drop; the oracle replays the same within-cell
    NOT-EXISTS over the same index files, so the cluster assignment is
    shared state, not re-derived."""
    from gonova_document_parser_spark.functions.similarity import semantic_dedup

    path = _ensure_semdedup_index(spark, sf_dir, n_cells=16)
    vectors = spark.read.parquet(f"{path}/vectors")
    return semantic_dedup(vectors, tau=0.95).select(
        "vec_id", F.col("cell").cast("int").alias("cell"), "keep"
    )


def _q_ivf_topk(spark, sf_dir):
    # IVF (KMeans cells + n_probe). Materialize-once + probe: the KMeans job
    # runs a single time per corpus content (index keyed by embeddings
    # digest, committed atomically); the per-query plan is a partition-pruned
    # scan of the n_probe closest cells + top-k — no KMeans in the query
    # plan.  The DuckDB oracle recomputes the probe (centroid ranking,
    # n_probe pruning, 4dp cosine top-k) over the SAME materialized index.
    from gonova_document_parser_spark.functions.similarity import ivf_probe

    path = _ensure_ivf_index(spark, sf_dir, n_cells=16)
    emb = _emb(spark, sf_dir)
    q = [float(v) for v in emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    # n_probe=6/16 cells: recall@10 0.85 for a 37.5% scan (sweep in
    # BENCH/BASELINE.md 1a: 4->0.76, 6->0.85, 8->0.91)
    return ivf_probe(spark, path, q, k=10, n_probe=6)


def _q_topic_mix(spark, sf_dir):
    """Embedding-cluster balance for data mixing: per-IVF-cell vector
    counts and parts-per-million share over the SAME materialized index
    ivf_topk probes — the histogram a mix-weighting step consumes to
    rebalance over-represented topic clusters.  Integer ppm (x*1e6 div
    total), so the oracle matches bit-for-bit with no float division."""
    from pyspark.sql import Window

    path = _ensure_ivf_index(spark, sf_dir, n_cells=16)
    v = spark.read.parquet(f"{path}/vectors")
    counts = v.groupBy("cell").agg(F.count(F.lit(1)).alias("n_vectors"))
    total = F.sum("n_vectors").over(Window.partitionBy(F.lit(1)))
    return counts.select(
        F.col("cell").cast("int").alias("cell"),
        "n_vectors",
        (F.col("n_vectors") * 1000000).cast("long").alias("_scaled"),
        total.alias("_tot"),
    ).selectExpr(
        "cell",
        "n_vectors",
        "_scaled div _tot as ppm",  # integral div: bit-exact vs DuckDB //
    )


def _q_media_features(spark, sf_dir):
    # opaque-binary ingestion over text-blob payloads: every output column is
    # an exact function of sha256(payload), which DuckDB reproduces —
    # feat0_byte round-trips the float32 feature vector back to its integer
    # byte so the features array is oracle-checked without float hazards.
    d = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("url"),
        F.encode("text", "utf-8").alias("payload"),
    )
    return media_features(d, payload_col="payload", fake=True).select(
        "url",
        "media_type",
        "width",
        "height",
        "n_bytes",
        F.round(F.element_at("features", 1) * 255, 0)
        .cast("int")
        .alias("feat0_byte"),
    )


def _q_media_resize(spark, sf_dir):
    """Aspect-fit resize plumbing over opaque binary payloads: source dims
    and output geometry are exact functions of sha256(payload) (DuckDB
    reproduces LEAST/FLOOR of the same integer math); r0 round-trips the
    stand-in resized payload's first byte so the stub output is pinned."""
    from gonova_document_parser_spark.operators.multimodal import resize_images

    d = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("url"),
        F.encode("text", "utf-8").alias("payload"),
    )
    out = resize_images(d, 224, 224, payload_col="payload", fake=True)
    return out.select(
        "url", "media_type", "src_width", "src_height", "width", "height",
        F.conv(F.substring(F.hex("resized"), 1, 2), 16, 10).cast("int").alias("r0"),
    )


def _q_media_frames(spark, sf_dir):
    """Frame-sampling fan-out: one payload row -> min(duration+1, 4) frame
    rows at 1 fps; duration and frame stand-ins are sha256-derived, so the
    whole explode shape (row counts, timestamps, payload bytes) is
    engine-exact."""
    from gonova_document_parser_spark.operators.multimodal import sample_frames

    d = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("url"),
        F.encode("text", "utf-8").alias("payload"),
    )
    out = sample_frames(d, fps=1.0, max_frames=4, payload_col="payload", fake=True)
    return out.select(
        "url", "media_type", "duration_s", "frame_idx", "ts_s",
        F.conv(F.substring(F.hex("frame"), 1, 2), 16, 10).cast("int").alias("f0"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # NOTE on ordering: the driver's CORRECTNESS snapshot records exactly the
    # FIRST 50 entries of this dict (observed r3: 57 registered -> first 50
    # recorded; r4: 65 -> same; r5: 73 -> same), and the registry holds 73
    # queries, so per-round snapshots cannot cover everything — the STANDING
    # ROTATION RULE (VERDICT r5 #5): each round, the longest-stale entries
    # (newest green row oldest) move into the head and the freshest-recorded
    # entries absorb the displacement, keeping every query's newest green
    # row at most ~2 rounds old.  Round 6 therefore heads the 23 entries
    # whose newest row is CORRECTNESS_r04 (topic_mix .. contamination — all
    # displaced in r5), followed by 27 of the 50 recorded green in
    # CORRECTNESS_r05; the 23 entries displaced past position 50 below ALL
    # hold green rows+schema+hash rows in CORRECTNESS_r05.json, so the
    # r5 union r6 snapshots again cover all 73 queries with no row older
    # than one round.
    return {
        # --- head: newest green row is r4 (rotated in this round) --------
        "topic_mix": _q_topic_mix,
        "merge_page_markers": _q_merge_page_markers,
        "status_stats": _q_status_stats,
        "cleanup_old": _q_cleanup_old,
        "media_features": _q_media_features,
        "media_resize": _q_media_resize,
        "media_frames": _q_media_frames,
        "graph_nodes": _q_graph_nodes,
        "graph_edges_count": _q_graph_edges_count,
        "signature_flags": _q_signature_flags,
        "route_explain": _q_route_explain,
        "analyzer_stats": _q_analyzer_stats,
        "doc_embeddings": _q_doc_embeddings,
        "result_lookup": _q_result_lookup,
        "simhash_neardups": _q_simhash_neardups,
        "curation_filter": _q_curation_filter,
        "token_histogram": _q_token_histogram,
        "pii_scrub": _q_pii_scrub,
        "url_canonical_dedup": _q_url_canonical_dedup,
        "repetition_stats": _q_repetition_stats,
        "line_dedup": _q_line_dedup,
        "dedup_clusters": _q_dedup_clusters,
        "contamination": _q_contamination,
        # --- head: recorded green in r5, kept inside the window ----------
        "sample_mix": _q_sample_mix,
        "hash_split": _q_hash_split,
        "governance_filter": _q_governance_filter,
        "incr_dedup": _q_incr_dedup,
        "script_stats": _q_script_stats,
        "rare_words": _q_rare_words,
        "crawl_diff": _q_crawl_diff,
        "seq_pack": _q_seq_pack,
        "latest_snapshot": _q_latest_snapshot,
        "dup_spans": _q_dup_spans,
        "remove_dup_spans": _q_remove_dup_spans,
        "host_graph": _q_host_graph,
        "host_pagerank": _q_host_pagerank,
        "domain_cap": _q_domain_cap,
        "top_ngrams": _q_top_ngrams,
        "semantic_dedup": _q_semantic_dedup,
        "robots_filter": _q_robots_filter,
        "lm_perplexity": _q_lm_perplexity,
        "anchor_texts": _q_anchor_texts,
        "bloom_frontier": _q_bloom_frontier,
        "boilerplate": _q_boilerplate,
        "dsir_weights": _q_dsir_weights,
        "frontier_schedule": _q_frontier_schedule,
        "extract_pipeline": _q_extract_pipeline,
        "classify_counts": _q_classify_counts,
        "native_ratio": _q_native_ratio,
        "route_breakdown": _q_route_breakdown,
        # --- tail: displaced past position 50 this round; every entry below
        # holds a green rows+schema+hash row in CORRECTNESS_r05.json -------
        "recent_jobs_topk": _q_recent_jobs_topk,
        "ordered_merge": _q_ordered_merge,
        "events_hourly": _q_events_hourly,
        "top_users_by_value": _q_top_users_by_value,
        "pricing_summary": _q_pricing_summary,
        "nation_revenue": _q_nation_revenue,
        "shipping_priority": _q_shipping_priority,
        "dedup_exact": _q_dedup_exact,
        "dedup_ngram_jaccard": _q_dedup_ngram_jaccard,
        "minhash_lsh_pairs": _q_minhash_lsh_pairs,
        "minhash_lsh_verified": _q_minhash_lsh_verified,
        "simhash": _q_simhash,
        "token_count_stats": _q_token_count_stats,
        "quality_scores": _q_quality_scores,
        "lang_id_counts": _q_lang_id_counts,
        "doc_fingerprints": _q_doc_fingerprints,
        "salted_counts": _q_salted_counts,
        "emb_topk_cosine": _q_emb_topk_cosine,
        "ann_topk_lsh": _q_ann_topk_lsh,
        "emb_neardups_lsh": _q_emb_neardups_lsh,
        "bpe_token_stats": _q_bpe_token_stats,
        "gopher_filter": _q_gopher_filter,
        "ivf_topk": _q_ivf_topk,
    }


# --------------------------------------------------------------------------
# oracle SQL (DuckDB dialect) — keys must match queries(); omitted keys are
# rows-only checks (engine-hash-dependent or pipeline ops; those have their
# own byte-identity / invariant coverage in tests/).
# --------------------------------------------------------------------------

_SW = {k: ", ".join(f"'{w}'" for w in v) for k, v in STOPWORDS.items()}

_LANG_HITS = {
    lang: (
        "len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), "
        f"t -> t IN ({_SW[lang]})))"
    )
    for lang in ("en", "fr", "es", "de")
}



def _script_stats_oracle_sql() -> str:
    """DuckDB twin of script_stats over the identically-mutated corpus:
    the literal codepoint ranges come from the SAME module constant, so
    engine and oracle can never drift."""
    from gonova_document_parser_spark.functions.textstats import SCRIPT_RANGES

    r = SCRIPT_RANGES
    counts = ",\n                       ".join(
        f"len(regexp_extract_all(text, '{r[k]}'))::INT AS n_{k}"
        for k in ("latin", "cjk", "cyrillic", "arabic", "digit")
    )
    return f"""
        WITH mutated AS (
            SELECT doc_id,
                   text || CASE
                     WHEN doc_id % 9 = 1 THEN ' привет мир данные корпус'
                     WHEN doc_id % 9 = 2 THEN ' مرحبا بالعالم نص عربي'
                     WHEN doc_id % 9 = 3 THEN ' 東京 大阪 データ 코퍼스'
                     ELSE '' END AS text
            FROM documents),
        counted AS (
            SELECT doc_id,
                   {counts}
            FROM mutated),
        scored AS (
            SELECT *,
                   (n_latin + n_cjk + n_cyrillic + n_arabic + n_digit) AS total,
                   GREATEST(n_latin, n_cjk, n_cyrillic, n_arabic, n_digit) AS best
            FROM counted)
        SELECT doc_id, n_latin, n_cjk, n_cyrillic, n_arabic, n_digit,
               CASE WHEN total = 0 THEN 'none'
                    WHEN n_latin = best THEN 'latin'
                    WHEN n_cjk = best THEN 'cjk'
                    WHEN n_cyrillic = best THEN 'cyrillic'
                    WHEN n_arabic = best THEN 'arabic'
                    WHEN n_digit = best THEN 'digit'
                    ELSE 'none' END AS dominant_script,
               ((CASE WHEN n_latin > 0 AND n_latin * 5 >= total THEN 1 ELSE 0 END
               + CASE WHEN n_cjk > 0 AND n_cjk * 5 >= total THEN 1 ELSE 0 END
               + CASE WHEN n_cyrillic > 0 AND n_cyrillic * 5 >= total THEN 1 ELSE 0 END
               + CASE WHEN n_arabic > 0 AND n_arabic * 5 >= total THEN 1 ELSE 0 END
               + CASE WHEN n_digit > 0 AND n_digit * 5 >= total THEN 1 ELSE 0 END)
                 >= 2) AS mixed_script
        FROM scored
    """


def _noindex_sql_pattern(which: int) -> str:
    from gonova_document_parser_spark.functions.governance import (
        _NOINDEX_CONTENT_FIRST,
        _NOINDEX_NAME_FIRST,
    )

    pat = (_NOINDEX_NAME_FIRST, _NOINDEX_CONTENT_FIRST)[which]
    return pat.replace("'", "''")


def _bpe_sql_pattern() -> str:
    from gonova_document_parser_spark.functions.textstats import BPE_TOKEN_RE

    return BPE_TOKEN_RE.replace("'", "''")


_BPE_SQL = _bpe_sql_pattern()


def _affine_values(num_hashes: int = 32) -> str:
    """Inline VALUES rows (i, a, b) of the affine minhash family."""
    from gonova_document_parser_spark.functions.dedup import _affine_params

    return ", ".join(
        f"({i}, {a}, {b})"
        for i, (a, b) in ((i, _affine_params(i)) for i in range(num_hashes))
    )


def _bp_verdict_sql(var: str = "x") -> str:
    """DuckDB replica of boilerplate.line_verdict_expr for one line
    ``var`` — built FROM the module constants (MARKER_RE / WORD_RE /
    STOPWORDS) so the two engines can never drift."""
    from gonova_document_parser_spark.functions.boilerplate import (
        MARKER_RE,
        WORD_RE,
    )
    from gonova_document_parser_spark.functions.textstats import STOPWORDS

    sw = "[" + ", ".join(f"'{w}'" for w in STOPWORDS["en"]) + "]"
    words = f"regexp_extract_all(lower(trim({var})), '{WORD_RE}')"
    return (
        f"length(trim({var})) >= 30 "
        f"AND len({words}) >= 4 "
        f"AND NOT regexp_matches(lower(trim({var})), '{MARKER_RE}') "
        f"AND (len(regexp_extract_all(trim({var}), '[A-Za-z]')) = 0 "
        f"OR len(regexp_extract_all(trim({var}), '[A-Z]')) "
        f"<= 0.5 * len(regexp_extract_all(trim({var}), '[A-Za-z]'))) "
        f"AND (len(list_filter({words}, w -> list_contains({sw}, w))) > 0 "
        f"OR len({words}) >= 12)"
    )


def _quant_planes_values(dim: int = 64, n_tables: int = 16, n_planes: int = 4) -> str:
    """Inline VALUES rows of the integer hyperplanes for the ANN oracle."""
    from gonova_document_parser_spark.functions.similarity import _int_hyperplane

    rows = []
    for t in range(n_tables):
        for p in range(n_planes):
            comps = ", ".join(str(v) for v in _int_hyperplane(dim, t, p))
            rows.append(f"({t}, {p}, [{comps}])")
    return ",\n                ".join(rows)


def _ivf_oracle_sql() -> str | None:
    """DuckDB SQL hard-verifying the IVF probe over the materialized index.

    Recomputes centroid distance ranking, n_probe=6 pruning, and the
    4dp-rounded cosine top-k from the SAME ``vectors``/``centroids`` parquet
    the Spark probe reads.  The seeded-KMeans index BUILD stays out of scope
    (genuinely non-SQL) — the index is taken as input; the probe math is the
    verified surface.  If the index is absent it is materialized first (one
    local KMeans over the oracle-scale embeddings); if that is impossible in
    the calling context, returns None and the driver records the rows-only
    check as before.
    """
    import os

    sf_dir = os.environ.get("GONOVA_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    try:
        from gonova_document_parser_spark.functions.similarity import (
            ivf_index_ready,
        )

        path = _ivf_index_path(sf_dir)
        if not ivf_index_ready(path):
            from gonova_document_parser_spark.session import get_spark

            spark = SparkSession.getActiveSession() or get_spark(
                master="local[8]", shuffle_partitions=16
            )
            path = _ensure_ivf_index(spark, sf_dir, n_cells=16)
    except Exception:  # no Spark available here -> keep the rows-only check
        return None
    # ranking key (distance, cell) and the 4dp cosine + vec_id tie-break
    # mirror ivf_probe exactly; list_distance is monotone in the python
    # dist2 so the n_probe cut is identical
    return f"""
        WITH q AS (
            SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        ranked AS (
            SELECT c.cell
            FROM read_parquet('{path}/centroids/*.parquet') c, q
            ORDER BY list_distance(c.centroid, q.qv), c.cell
            LIMIT 6)
        SELECT v.vec_id,
               ROUND(list_cosine_similarity(v.embedding::DOUBLE[],
                     (SELECT qv FROM q)), 4)::DOUBLE AS cosine
        FROM read_parquet('{path}/vectors/*/*.parquet', hive_partitioning=1) v
        WHERE v.cell IN (SELECT cell FROM ranked)
        ORDER BY cosine DESC, v.vec_id
        LIMIT 10
    """


def oracle_sql() -> dict[str, str]:
    jaccard = "(n_inter * 1.0 / (n_a + n_b - n_inter))"
    out = {
        "classify_counts": """
            SELECT CASE WHEN n_chars < 50 THEN 'scanned'
                        WHEN n_chars < 200 THEN 'short'
                        ELSE 'native' END AS page_type,
                   COUNT(*) AS c
            FROM documents GROUP BY 1
        """,
        "native_ratio": """
            SELECT lang,
                   ROUND(AVG(CASE WHEN n_chars >= 50 THEN 1.0 ELSE 0.0 END), 6)::DOUBLE
                     AS native_ratio
            FROM documents GROUP BY lang
        """,
        "route_breakdown": """
            SELECT CASE WHEN n_chars < 50 THEN 'nanonets'
                        WHEN lang = 'zh' THEN 'deepseek-ocr'
                        ELSE 'deepseek' END AS route,
                   COUNT(*) AS c
            FROM documents GROUP BY 1
        """,
        "recent_jobs_topk": f"""
            SELECT event_id,
                   strftime(ts, '{_TS_FMT_DUCK}') AS ts_str,
                   event_type,
                   ROUND(value, 4)::DOUBLE AS value_r
            FROM events ORDER BY ts DESC, event_id DESC LIMIT 100
        """,
        "ordered_merge": """
            SELECT source,
                   STRING_AGG(text, chr(10)||chr(10)||'---'||chr(10)||chr(10)
                              ORDER BY doc_id) AS merged
            FROM documents GROUP BY source
        """,
        "merge_page_markers": """
            WITH numbered AS (
                SELECT source, text,
                       ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
                FROM documents)
            SELECT source,
                   STRING_AGG('<!-- Page ' || rn || ' -->' || chr(10) || chr(10) || text,
                              chr(10)||chr(10)||'---'||chr(10)||chr(10) ORDER BY rn)
                     AS merged
            FROM numbered GROUP BY source
        """,
        "status_stats": "SELECT event_type, COUNT(*) AS c FROM events GROUP BY event_type",
        "cleanup_old": """
            SELECT event_type, COUNT(*) AS n_deleted
            FROM events WHERE ts < TIMESTAMP '2024-06-01' GROUP BY event_type
        """,
        "events_hourly": f"""
            SELECT strftime(date_trunc('hour', ts), '{_TS_FMT_DUCK}') AS hour_str,
                   event_type, COUNT(*) AS c,
                   ROUND(SUM(value), 4)::DOUBLE AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "top_users_by_value": """
            SELECT user_id, ROUND(SUM(value), 4)::DOUBLE AS total_value,
                   COUNT(*) AS n_events
            FROM events GROUP BY user_id
            ORDER BY total_value DESC, user_id LIMIT 50
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2)::DOUBLE AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2)::DOUBLE AS sum_base_price,
                   ROUND(AVG(l_discount), 6)::DOUBLE AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "nation_revenue": """
            SELECT n_name, ROUND(SUM(o_totalprice), 2)::DOUBLE AS revenue,
                   COUNT(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "shipping_priority": """
            SELECT l_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
                   o_orderpriority,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)::DOUBLE
                     AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < DATE '1995-03-15'
              AND l_shipdate > DATE '1995-03-15'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, l_orderkey LIMIT 10
        """,
        "dedup_exact": """
            SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
                   COUNT(*) AS n_dups, MIN(doc_id) AS keeper
            FROM documents GROUP BY 1
        """,
        "dedup_ngram_jaccard": f"""
            WITH words AS (
                SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
                FROM documents),
            sh0 AS (
                SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                FROM words, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
                WHERE len(w) >= 3),
            hot AS (
                SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) > 1000),
            sh AS (
                SELECT doc_id, shingle FROM sh0
                WHERE shingle NOT IN (SELECT shingle FROM hot)),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
                FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
            SELECT id_a, id_b,
                   ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 6)::DOUBLE
                     AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
        """,
        "token_count_stats": """
            SELECT lang,
                   SUM(len(string_split_regex(lower(trim(text)), '\\s+')))::BIGINT
                     AS total_tokens,
                   ROUND(AVG(len(string_split_regex(lower(trim(text)), '\\s+'))), 6)::DOUBLE
                     AS avg_tokens
            FROM documents GROUP BY lang
        """,
        "quality_scores": f"""
            SELECT doc_id,
                   ROUND(
                     LEAST(length(text) / 500.0, 1.0) * 0.5 +
                     CASE WHEN len(string_split_regex(lower(trim(text)), '\\s+')) > 0
                          THEN {_LANG_HITS['en']} * 1.0 /
                               len(string_split_regex(lower(trim(text)), '\\s+'))
                          ELSE 0.0 END * 0.5,
                   6)::DOUBLE AS qscore
            FROM documents
        """,
        "lang_id_counts": f"""
            WITH hits AS (
                SELECT lang AS lang_true,
                       {_LANG_HITS['en']} AS h_en, {_LANG_HITS['fr']} AS h_fr,
                       {_LANG_HITS['es']} AS h_es, {_LANG_HITS['de']} AS h_de,
                       regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') AS has_cjk
                FROM documents),
            pred AS (
                SELECT lang_true,
                       CASE WHEN has_cjk THEN 'zh'
                            WHEN GREATEST(h_en, h_fr, h_es, h_de) <= 0 THEN 'und'
                            WHEN h_en = GREATEST(h_en, h_fr, h_es, h_de) THEN 'en'
                            WHEN h_fr = GREATEST(h_en, h_fr, h_es, h_de) THEN 'fr'
                            WHEN h_es = GREATEST(h_en, h_fr, h_es, h_de) THEN 'es'
                            ELSE 'de' END AS lang_pred
                FROM hits)
            SELECT lang_true, lang_pred, COUNT(*) AS c FROM pred GROUP BY 1, 2
        """,
        "doc_fingerprints": """
            SELECT doc_id,
                   md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
            FROM documents
        """,
        "salted_counts": "SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source",
        "result_lookup": """
            SELECT doc_id, text, lang FROM documents WHERE doc_id IN (7, 42, 123)
        """,
        "curation_filter": f"""
            WITH scored AS (
                SELECT doc_id, source,
                       ROUND(
                         LEAST(length(text) / 500.0, 1.0) * 0.5 +
                         CASE WHEN len(string_split_regex(lower(trim(text)), '\\s+')) > 0
                              THEN {_LANG_HITS['en']} * 1.0 /
                                   len(string_split_regex(lower(trim(text)), '\\s+'))
                              ELSE 0.0 END * 0.5,
                       6)::DOUBLE AS q,
                       CASE WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
                            WHEN GREATEST({_LANG_HITS['en']}, {_LANG_HITS['fr']},
                                          {_LANG_HITS['es']}, {_LANG_HITS['de']}) <= 0 THEN 'und'
                            WHEN {_LANG_HITS['en']} = GREATEST({_LANG_HITS['en']}, {_LANG_HITS['fr']},
                                          {_LANG_HITS['es']}, {_LANG_HITS['de']}) THEN 'en'
                            WHEN {_LANG_HITS['fr']} = GREATEST({_LANG_HITS['en']}, {_LANG_HITS['fr']},
                                          {_LANG_HITS['es']}, {_LANG_HITS['de']}) THEN 'fr'
                            WHEN {_LANG_HITS['es']} = GREATEST({_LANG_HITS['en']}, {_LANG_HITS['fr']},
                                          {_LANG_HITS['es']}, {_LANG_HITS['de']}) THEN 'es'
                            ELSE 'de' END AS lp,
                       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
                FROM documents),
            keep_one AS (SELECT fp, MIN(doc_id) AS keeper FROM scored GROUP BY fp)
            SELECT source, COUNT(*) AS n_kept
            FROM scored JOIN keep_one ON doc_id = keeper
            WHERE q >= 0.3 AND lp = 'en'
            GROUP BY source
        """,
        "token_histogram": """
            SELECT (FLOOR(len(string_split_regex(lower(trim(text)), '\\s+')) / 10) * 10)::BIGINT
                     AS bucket,
                   COUNT(*) AS c
            FROM documents GROUP BY 1
        """,
        "graph_nodes": """
            WITH numbered AS (
                SELECT source, text,
                       ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
                FROM documents),
            merged AS (
                SELECT source,
                       STRING_AGG('<!-- Page ' || rn || ' -->' || chr(10) || chr(10) || text,
                                  chr(10)||chr(10)||'---'||chr(10)||chr(10) ORDER BY rn)
                         AS merged
                FROM numbered GROUP BY source),
            parts AS (
                SELECT source,
                       string_split(merged, chr(10)||chr(10)||'---'||chr(10)||chr(10)) AS p
                FROM merged)
            SELECT source,
                   'page_' || (generate_subscripts(p, 1) - 1) AS node_id,
                   'page' AS node_type,
                   generate_subscripts(p, 1)::INT AS page,
                   unnest(p) AS content
            FROM parts
        """,
        "graph_edges_count": """
            WITH numbered AS (
                SELECT source, text,
                       ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
                FROM documents),
            merged AS (
                SELECT source,
                       STRING_AGG('<!-- Page ' || rn || ' -->' || chr(10) || chr(10) || text,
                                  chr(10)||chr(10)||'---'||chr(10)||chr(10) ORDER BY rn)
                         AS merged
                FROM numbered GROUP BY source)
            SELECT source,
                   (len(string_split(merged, chr(10)||chr(10)||'---'||chr(10)||chr(10))) - 1)::INT
                     AS n_edges
            FROM merged
        """,
        "signature_flags": """
            SELECT doc_id,
                   CASE WHEN regexp_matches(lower(text),
                        'signature|signed|authorized|signatory')
                        THEN 1 ELSE 0 END AS has_sig
            FROM documents
        """,
        "emb_topk_cosine": """
            SELECT vec_id,
                   ROUND(list_cosine_similarity(
                       embedding::DOUBLE[],
                       (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)),
                     4)::DOUBLE AS cosine
            FROM embeddings
            ORDER BY cosine DESC, vec_id LIMIT 20
        """,
        # -- integer-quantized ANN: bucket bits from exact integer dot
        #    products (|products| < 2^53, exact even in float64), so DuckDB
        #    reproduces the candidate set; final scoring reuses the proven
        #    4dp cosine
        "ann_topk_lsh": f"""
            WITH planes(t, p, comps) AS (
                VALUES {_quant_planes_values()}),
            qv AS (
                SELECT list_transform(embedding::DOUBLE[],
                                      x -> ROUND(x * 1000)) AS q
                FROM embeddings WHERE vec_id = 0),
            qb AS (
                SELECT pl.t,
                       SUM(CASE WHEN list_dot_product(qv.q, pl.comps::DOUBLE[]) >= 0
                                THEN (1 << pl.p) ELSE 0 END) AS bucket
                FROM qv, planes pl GROUP BY pl.t),
            vb AS (
                SELECT e.vec_id, pl.t,
                       SUM(CASE WHEN list_dot_product(
                                  list_transform(e.embedding::DOUBLE[],
                                                 x -> ROUND(x * 1000)),
                                  pl.comps::DOUBLE[]) >= 0
                                THEN (1 << pl.p) ELSE 0 END) AS bucket
                FROM embeddings e, planes pl GROUP BY e.vec_id, pl.t),
            cands AS (
                SELECT DISTINCT vb.vec_id
                FROM vb JOIN qb ON vb.t = qb.t AND vb.bucket = qb.bucket)
            SELECT e.vec_id,
                   ROUND(list_cosine_similarity(
                       e.embedding::DOUBLE[],
                       (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)),
                     4)::DOUBLE AS cosine
            FROM embeddings e JOIN cands USING (vec_id)
            ORDER BY cosine DESC, vec_id LIMIT 10
        """,
        # -- resize plumbing: sha-derived source dims -> LEAST/FLOOR aspect
        #    fit -> sha-derived stand-in payload byte, all engine-exact
        "media_resize": """
            WITH m AS (
                SELECT CAST(doc_id AS VARCHAR) AS url,
                       CASE WHEN starts_with(text, '%PDF-') THEN 'pdf_scan'
                            ELSE 'image' END AS media_type,
                       1 + ('0x' || substr(sha256(text), 1, 2))::INT AS sw,
                       1 + ('0x' || substr(sha256(text), 3, 2))::INT AS sh,
                       text
                FROM documents),
            s AS (SELECT *, LEAST(224.0 / sw, 224.0 / sh, 1.0) AS sc FROM m),
            g AS (SELECT url, media_type, sw, sh, text,
                         GREATEST(1, CAST(FLOOR(sw * sc) AS INT)) AS w,
                         GREATEST(1, CAST(FLOOR(sh * sc) AS INT)) AS h
                  FROM s)
            SELECT url, media_type,
                   sw AS src_width, sh AS src_height,
                   w AS width, h AS height,
                   ('0x' || substr(sha256(text || ':' || CAST(w AS VARCHAR)
                        || 'x' || CAST(h AS VARCHAR)), 1, 2))::INT AS r0
            FROM g
        """,
        # -- frame-sampling fan-out: sha-derived duration -> generate_series
        #    of min(d+1, 4) frames at 1 fps, stand-in frame byte pinned
        "media_frames": """
            WITH m AS (
                SELECT CAST(doc_id AS VARCHAR) AS url,
                       CASE WHEN starts_with(text, '%PDF-') THEN 'pdf_scan'
                            ELSE 'image' END AS media_type,
                       1 + ('0x' || substr(sha256(text), 5, 2))::INT % 30 AS d,
                       text
                FROM documents)
            SELECT url, media_type,
                   CAST(d AS DOUBLE) AS duration_s,
                   k::INT AS frame_idx,
                   CAST(k AS DOUBLE) AS ts_s,
                   ('0x' || substr(sha256(text || ':' || CAST(k AS VARCHAR)),
                                   1, 2))::INT AS f0
            FROM m, UNNEST(generate_series(0, LEAST(d + 1, 4) - 1)) AS t(k)
        """,
        # -- BPE-ish token budget: identical RE2-safe GPT-2-style pattern
        #    (single quotes doubled for SQL)
        "bpe_token_stats": """
            SELECT lang,
                   SUM(len(regexp_extract_all(text,
                       '{bpe}')))::BIGINT AS total_bpe,
                   ROUND(AVG(len(regexp_extract_all(text,
                       '{bpe}'))), 6)::DOUBLE AS avg_bpe
            FROM documents GROUP BY lang
        """.replace("{bpe}", _BPE_SQL),
        # -- Gopher curation gate: integer-count comparisons, engine-exact
        "gopher_filter": r"""
            WITH d AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(string_split_regex(trim(text), '\s+'))
                       END AS n_words,
                       len(regexp_replace(text, '\s', '', 'g')) AS nwchars,
                       len(regexp_extract_all(text, '#|\.\.\.')) AS symbols,
                       len(list_filter(string_split_regex(trim(text), '\s+'),
                                       w -> regexp_matches(w, '\p{L}'))) AS alpha
                FROM documents)
            SELECT doc_id, n_words,
                   (n_words >= 50 AND n_words <= 100000) AS flag_word_count,
                   COALESCE(nwchars * 1.0 / NULLIF(n_words, 0) >= 3.0
                            AND nwchars * 1.0 / NULLIF(n_words, 0) <= 10.0,
                            FALSE) AS flag_mean_word_len,
                   COALESCE(symbols * 1.0 / NULLIF(n_words, 0) <= 0.1,
                            FALSE) AS flag_symbol_ratio,
                   COALESCE(alpha * 1.0 / NULLIF(n_words, 0) >= 0.8,
                            FALSE) AS flag_alpha_words,
                   ((n_words >= 50 AND n_words <= 100000)
                    AND COALESCE(nwchars * 1.0 / NULLIF(n_words, 0) >= 3.0
                                 AND nwchars * 1.0 / NULLIF(n_words, 0) <= 10.0,
                                 FALSE)
                    AND COALESCE(symbols * 1.0 / NULLIF(n_words, 0) <= 0.1,
                                 FALSE)
                    AND COALESCE(alpha * 1.0 / NULLIF(n_words, 0) >= 0.8,
                                 FALSE)) AS keep
            FROM d
        """,
        # -- embedding near-dups: quantized buckets (4 tables x 16 planes,
        #    exact integer math) -> pair equi-join -> exact cosine verify;
        #    deterministic +1e6 duplicates provide the true positives
        "emb_neardups_lsh": f"""
            WITH emb2 AS (
                SELECT vec_id, embedding FROM embeddings
                UNION ALL
                SELECT vec_id + 1000000 AS vec_id, embedding
                FROM embeddings WHERE vec_id < 50),
            planes(t, p, comps) AS (
                VALUES {_quant_planes_values(64, 4, 16)}),
            vb AS (
                SELECT e.vec_id, pl.t,
                       SUM(CASE WHEN list_dot_product(
                                  list_transform(e.embedding::DOUBLE[],
                                                 x -> ROUND(x * 1000)),
                                  pl.comps::DOUBLE[]) >= 0
                                THEN (1 << pl.p) ELSE 0 END) AS bucket
                FROM emb2 e, planes pl GROUP BY e.vec_id, pl.t),
            cand AS (
                SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
                FROM vb a
                JOIN vb b ON a.t = b.t AND a.bucket = b.bucket
                         AND a.vec_id < b.vec_id)
            SELECT c.id_a, c.id_b,
                   ROUND(list_cosine_similarity(ea.embedding::DOUBLE[],
                                                eb.embedding::DOUBLE[]),
                         4)::DOUBLE AS cosine
            FROM cand c
            JOIN emb2 ea ON ea.vec_id = c.id_a
            JOIN emb2 eb ON eb.vec_id = c.id_b
            WHERE list_cosine_similarity(ea.embedding::DOUBLE[],
                                         eb.embedding::DOUBLE[]) >= 0.99
        """,
        # -- THE FLAGSHIP ORACLE: the page render (corpus.doc_to_page) and the
        #    extractor (spec/) are both deterministic pure functions of
        #    (doc_id, text), so the extracted text — page markers, heading +
        #    12-word paragraph blocks for HTML, 6-word lines in 4-line blocks
        #    for PDFs, exact error-marker bytes for scanned — is closed-form
        #    SQL.  Validated byte-identical over every sf0.01 document.
        "extract_pipeline": r"""
            WITH d AS (
                SELECT doc_id,
                       list_filter(string_split_regex(trim(text), '\s+'),
                                   w -> w <> '') AS ws
                FROM documents),
            m AS (
                SELECT doc_id, ws, len(ws) AS nw, doc_id % 10 AS m10 FROM d),
            pdfl AS (
                SELECT doc_id, ws, nw, m10,
                       CASE WHEN nw = 0 THEN ['doc ' || CAST(doc_id AS VARCHAR)]
                            ELSE list_transform(
                                   generate_series(1, CAST(CEIL(nw/6.0) AS INT)),
                                   i -> array_to_string(ws[(i-1)*6+1 : i*6], ' '))
                       END AS lines
                FROM m),
            feat AS (
                SELECT doc_id, ws, nw, m10, lines,
                       list_aggregate(list_transform(lines, l -> len(l)), 'sum')
                         AS pdf_chars,
                       len(lines) AS n_lines
                FROM pdfl),
            built AS (
                SELECT doc_id, m10,
                       CASE
                         WHEN m10 <= 6 THEN
                           list_prepend('Document ' || CAST(doc_id AS VARCHAR),
                             list_transform(
                               generate_series(1, CAST(CEIL(nw/12.0) AS INT)),
                               i -> array_to_string(ws[(i-1)*12+1 : i*12], ' ')))
                         WHEN m10 = 9 OR pdf_chars < 50 THEN []::VARCHAR[]
                         ELSE list_transform(
                                generate_series(1, CAST(CEIL(n_lines/4.0) AS INT)),
                                j -> array_to_string(lines[(j-1)*4+1 : j*4], chr(10)))
                       END AS blocks,
                       (m10 BETWEEN 7 AND 8) AND pdf_chars >= 50 AS is_pdf
                FROM feat)
            SELECT 'https://docs.example.com/d/' || CAST(doc_id AS VARCHAR) AS url,
                   CASE WHEN m10 <= 6 THEN 'html'
                        WHEN is_pdf THEN 'pdf' ELSE 'scanned' END AS page_type,
                   CASE WHEN m10 <= 6 OR is_pdf THEN
                          '<!-- Page 1 -->' || chr(10) || chr(10)
                          || array_to_string(blocks, chr(10) || chr(10))
                        ELSE '<!-- Page 1 -->' || chr(10) || chr(10)
                          || '[Error processing page 1: no extractable text layer]'
                   END AS extracted_text,
                   CASE WHEN m10 <= 6 OR is_pdf THEN len(blocks)
                        ELSE 0 END::INT AS n_blocks,
                   (m10 <= 6 OR is_pdf) AS success,
                   CASE WHEN m10 <= 6 OR is_pdf THEN ''
                        ELSE '[Error processing page 1: no extractable text layer]'
                   END AS error
            FROM built
        """,
        # -- URL canonicalization: same RE2 regexes, DuckDB backrefs are \1
        #    (Spark uses $1); 'g' flag where Spark's replace-all semantics
        #    matter (non-anchored patterns)
        # -- host graph: the oracle knows the deterministic render's link
        #    structure closed-form (9 boilerplate hrefs per html page,
        #    none for pdf/scanned, +1 planted partner link per page)
        "host_graph": _HOST_EDGES_SQL
        + """
            SELECT src_host, dst_host, n_links FROM edges
        """,
        "host_pagerank": _HOST_EDGES_SQL
        + """,
            nodes AS (
                SELECT DISTINCT src_host AS host FROM edges
                UNION
                SELECT DISTINCT dst_host AS host FROM edges),
            outw AS (
                SELECT src_host, SUM(n_links) AS wsum FROM edges GROUP BY 1),
            pr0 AS (SELECT host, 1000000::BIGINT AS r FROM nodes)
        """
        + _PAGERANK_ITERS_SQL
        + """
            SELECT host, r AS rank_scaled FROM pr5
        """,
        "dup_spans": """
            WITH base AS (SELECT doc_id, text FROM documents),
            aug AS (
                SELECT doc_id, text FROM base
                UNION ALL
                SELECT doc_id + 8000000 AS doc_id,
                       array_to_string(
                         (string_split_regex(lower(trim(text)), '\\s+'))[1:20],
                         ' ') AS text
                FROM base WHERE doc_id < 15),
            words AS (
                SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
                FROM aug),
            wins AS (
                SELECT doc_id, i - 1 AS pos,
                       md5(array_to_string(w[i:i+9], ' ')) AS wh
                FROM words, UNNEST(generate_series(1, len(w) - 9)) AS t(i)
                WHERE len(w) >= 10),
            dup AS (
                SELECT wh FROM wins
                GROUP BY wh HAVING COUNT(DISTINCT doc_id) >= 2),
            hit AS (
                SELECT doc_id, list_sort(list_distinct(list(pos))) AS ps,
                       COUNT(DISTINCT pos) AS nw
                FROM wins JOIN dup USING (wh) GROUP BY doc_id),
            cov AS (
                SELECT doc_id, nw,
                       10 + COALESCE(list_sum(list_transform(
                             generate_series(1, len(ps) - 1),
                             i -> least(10, ps[i+1] - ps[i]))), 0) AS covered
                FROM hit)
            SELECT t.doc_id,
                   COALESCE(c.nw, 0)::BIGINT AS n_dup_windows,
                   ROUND(CASE WHEN c.nw IS NOT NULL AND len(t.w) > 0
                              THEN c.covered * 1.0 / len(t.w)
                              ELSE 0.0 END, 6)::DOUBLE AS dup_frac
            FROM words t LEFT JOIN cov c USING (doc_id)
        """,
        "governance_filter": f"""
            WITH pages AS (
                SELECT doc_id,
                       CASE doc_id % 5
                         WHEN 0 THEN 'docs.example.com'
                         WHEN 1 THEN 'sub.spam.example.net'
                         WHEN 2 THEN 'spam.example.net'
                         WHEN 3 THEN 'notspam.example.net'
                         ELSE 'ads.example.org' END AS host,
                       '<html><head>' ||
                       CASE WHEN doc_id % 7 = 0
                              THEN '<meta name="robots" content="noindex, nofollow">'
                            WHEN doc_id % 11 = 0
                              THEN '<meta content=''NOINDEX'' name=robots>'
                            ELSE '<meta name="robots" content="index, follow">'
                       END || '</head><body>' || substr(text, 1, 80) ||
                       '</body></html>' AS html
                FROM documents),
            flags AS (
                SELECT doc_id,
                       'https://' || host || '/d/' || doc_id AS url,
                       (regexp_matches(html, '{_noindex_sql_pattern(0)}')
                        OR regexp_matches(html, '{_noindex_sql_pattern(1)}'))
                         AS noindex,
                       list_has_any(
                         list_transform(
                           generate_series(1, len(string_split(host, '.'))),
                           i -> array_to_string(string_split(host, '.')[i:], '.')),
                         ['spam.example.net', 'ads.example.org'])
                         AS domain_blocked
                FROM pages)
            SELECT doc_id, url, noindex, domain_blocked,
                   NOT (noindex OR domain_blocked) AS keep
            FROM flags
        """,
        "script_stats": _script_stats_oracle_sql(),
        "rare_words": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
                FROM documents),
            counts AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
            flagged AS (
                SELECT t.doc_id, (c.n <= 2) AS rare
                FROM toks t JOIN counts c USING (tok))
            SELECT doc_id,
                   COUNT(*)::BIGINT AS n_tokens,
                   SUM(CASE WHEN rare THEN 1 ELSE 0 END)::BIGINT AS n_rare,
                   ROUND(SUM(CASE WHEN rare THEN 1 ELSE 0 END) * 1.0 / COUNT(*),
                         6)::DOUBLE AS rare_ratio
            FROM flagged GROUP BY doc_id
        """,
        "incr_dedup": rf"""
            WITH delta_docs AS (
                SELECT doc_id + 9200000 AS doc_id, text
                FROM documents WHERE doc_id < 10
                UNION ALL
                SELECT 9300000, '{_DELTA_TWIN_TEXT}'
                UNION ALL
                SELECT 9300001, '{_DELTA_TWIN_TEXT}'
                UNION ALL
                SELECT doc_id + 9400000 AS doc_id,
                       'novel' || doc_id || ' delta' || doc_id ||
                       ' document' || doc_id || ' unique' || doc_id ||
                       ' words' || doc_id || ' qq' || doc_id AS text
                FROM documents WHERE doc_id < 8),
            all_docs AS (
                SELECT doc_id, text FROM documents
                UNION ALL SELECT doc_id, text FROM delta_docs),
            words AS (
                SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
                FROM all_docs),
            sh0 AS (
                SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                FROM words, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
                WHERE len(w) >= 3),
            sh AS (
                SELECT doc_id,
                       ('0x' || substr(md5(shingle), 1, 15))::BIGINT
                         % 2147483647 AS h0
                FROM sh0),
            params(i, a, b) AS (VALUES {_affine_values()}),
            sigs AS (
                SELECT doc_id, p.i, MIN((p.a * h0 + p.b) % 2147483647) AS sig
                FROM sh, params p GROUP BY doc_id, p.i),
            all_bands AS (
                SELECT doc_id, i // 4 AS band_id,
                       md5(string_agg(CAST(sig AS VARCHAR), ',' ORDER BY i))
                         AS band_hash
                FROM sigs GROUP BY doc_id, i // 4),
            store_bands AS (SELECT * FROM all_bands WHERE doc_id < 9200000),
            delta_bands AS (SELECT * FROM all_bands WHERE doc_id >= 9200000),
            vs_store AS (
                SELECT d.doc_id, MIN(s.doc_id) AS dup_of_store
                FROM delta_bands d JOIN store_bands s
                  ON d.band_id = s.band_id AND d.band_hash = s.band_hash
                GROUP BY d.doc_id),
            within AS (
                SELECT a.doc_id, MIN(b.doc_id) AS dup_in_delta
                FROM delta_bands a JOIN delta_bands b
                  ON a.band_id = b.band_id AND a.band_hash = b.band_hash
                 AND b.doc_id < a.doc_id
                GROUP BY a.doc_id)
            SELECT dd.doc_id, v.dup_of_store, w2.dup_in_delta,
                   (v.dup_of_store IS NULL AND w2.dup_in_delta IS NULL) AS keep
            FROM delta_docs dd
            LEFT JOIN vs_store v ON v.doc_id = dd.doc_id
            LEFT JOIN within w2 ON w2.doc_id = dd.doc_id
        """,
        "crawl_diff": """
            WITH old_snap AS (
                SELECT 'https://docs.example.com/d/' || doc_id AS url,
                       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS old_fp
                FROM documents),
            new_snap AS (
                SELECT 'https://docs.example.com/d/' || doc_id AS url,
                       md5(trim(regexp_replace(lower(
                         CASE WHEN doc_id % 11 = 0 THEN text || ' refetched'
                              ELSE '  ' || text || chr(10) END),
                         '\\s+', ' ', 'g'))) AS new_fp
                FROM documents WHERE doc_id % 13 <> 0
                UNION ALL
                SELECT 'https://docs.example.com/d/' || (doc_id + 9100000) AS url,
                       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS new_fp
                FROM documents WHERE doc_id < 10)
            SELECT COALESCE(o.url, n.url) AS url,
                   CASE WHEN o.old_fp IS NULL THEN 'added'
                        WHEN n.new_fp IS NULL THEN 'removed'
                        WHEN o.old_fp = n.new_fp THEN 'unchanged'
                        ELSE 'changed' END AS status,
                   o.old_fp, n.new_fp
            FROM old_snap o FULL OUTER JOIN new_snap n ON o.url = n.url
        """,
        "seq_pack": """
            WITH t AS (
                SELECT doc_id,
                       len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens
                FROM documents),
            s AS (
                SELECT doc_id, n_tokens,
                       SUM(n_tokens) OVER (
                         ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) - n_tokens AS start_offset
                FROM t)
            SELECT doc_id,
                   n_tokens::INT AS n_tokens,
                   start_offset::BIGINT AS start_offset,
                   (start_offset // 2048)::INT AS chunk_id
            FROM s
        """,
        "remove_dup_spans": """
            WITH base AS (SELECT doc_id, text FROM documents),
            aug AS (
                SELECT doc_id, text FROM base
                UNION ALL
                SELECT doc_id + 8000000 AS doc_id,
                       array_to_string(
                         (string_split_regex(lower(trim(text)), '\\s+'))[1:20],
                         ' ') AS text
                FROM base WHERE doc_id < 15),
            words AS (
                SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
                FROM aug),
            wins AS (
                SELECT doc_id, i - 1 AS pos,
                       md5(array_to_string(w[i:i+9], ' ')) AS wh
                FROM words, UNNEST(generate_series(1, len(w) - 9)) AS t(i)
                WHERE len(w) >= 10),
            dupw AS (
                SELECT wh FROM wins
                GROUP BY wh HAVING COUNT(DISTINCT doc_id) >= 2),
            occ AS (
                SELECT v.doc_id, v.pos,
                       ROW_NUMBER() OVER (
                         PARTITION BY v.wh ORDER BY v.doc_id, v.pos) AS rn
                FROM wins v JOIN dupw USING (wh)),
            hit AS (
                SELECT doc_id, list_sort(list_distinct(list(pos))) AS ps
                FROM occ WHERE rn > 1 GROUP BY doc_id),
            kept AS (
                SELECT t.doc_id,
                       list_filter(t.w, (x, i) ->
                         len(list_filter(COALESCE(h.ps, []),
                             p -> (i - 1) >= p AND (i - 1) <= p + 9)) = 0
                       ) AS kw,
                       len(t.w) AS n_toks
                FROM words t LEFT JOIN hit h USING (doc_id))
            SELECT doc_id,
                   -- array_to_string([]) is NULL in DuckDB; Spark's
                   -- concat_ws on an empty array is '' — align on ''
                   COALESCE(array_to_string(kw, ' '), '') AS clean_text,
                   len(kw)::INT AS n_kept,
                   (n_toks - len(kw))::INT AS n_removed
            FROM kept
        """,
        "top_ngrams": """
            WITH words AS (
                SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
                FROM documents),
            sh AS (
                SELECT w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                FROM words, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
                WHERE len(w) >= 3)
            SELECT shingle, COUNT(*) AS n FROM sh
            GROUP BY shingle ORDER BY n DESC, shingle ASC LIMIT 50
        """,
        "domain_cap": f"""
            WITH scored AS (
                SELECT doc_id, source,
                       ROUND(
                         LEAST(length(text) / 500.0, 1.0) * 0.5 +
                         CASE WHEN len(string_split_regex(lower(trim(text)), '\\s+')) > 0
                              THEN {_LANG_HITS['en']} * 1.0 /
                                   len(string_split_regex(lower(trim(text)), '\\s+'))
                              ELSE 0.0 END * 0.5,
                       6)::DOUBLE AS q
                FROM documents),
            ranked AS (
                SELECT doc_id, source, q,
                       ROW_NUMBER() OVER (
                           PARTITION BY source
                           ORDER BY q DESC, doc_id) AS rn
                FROM scored)
            SELECT doc_id, source, q FROM ranked WHERE rn <= 10
        """,
        "latest_snapshot": f"""
            WITH ranked AS (
                SELECT event_id, user_id, event_type, ts, value,
                       ROW_NUMBER() OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY ts DESC, event_id DESC) AS rn
                FROM events)
            SELECT event_id, user_id, event_type,
                   strftime(ts, '{_TS_FMT_DUCK}') AS ts_s,
                   ROUND(value, 2)::DOUBLE AS value
            FROM ranked WHERE rn = 1
        """,
        # -- sampling: same md5-prefix integer hash and integer thresholds
        #    as functions/sampling.py — exact membership, no float compare
        "sample_mix": f"""
            SELECT doc_id, source FROM documents
            WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 7))::BIGINT <
                  CASE source
                       WHEN 'src0' THEN {int(1.0 * (1 << 28))}
                       WHEN 'src1' THEN {int(0.5 * (1 << 28))}
                       WHEN 'src2' THEN {int(0.25 * (1 << 28))}
                       WHEN 'src3' THEN {int(0.1 * (1 << 28))}
                       ELSE {int(0.05 * (1 << 28))} END
        """,
        "hash_split": f"""
            SELECT doc_id,
                   CASE WHEN h < {int(0.8 * (1 << 28))} THEN 'train'
                        WHEN h < {int((0.8 + 0.1) * (1 << 28))} THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT doc_id,
                         ('0x' || substr(md5(doc_id::VARCHAR), 1, 7))::BIGINT
                           AS h
                  FROM documents)
        """,
        "contamination": f"""
            WITH ev AS (
                SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0),
            scanned AS (
                SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0
                UNION ALL
                SELECT doc_id + 7000000 AS doc_id, 'zz zz zz ' || text AS text
                FROM ev),
            evw AS (
                SELECT string_split_regex(lower(trim(text)), '\\s+') AS w
                FROM ev),
            evsh AS (
                SELECT DISTINCT {" || ' ' || ".join(
                    f"w[i+{k}]" if k else "w[i]" for k in range(13)
                )} AS shingle
                FROM evw, UNNEST(generate_series(1, len(w) - 12)) AS t(i)
                WHERE len(w) >= 13),
            words AS (
                SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
                FROM scanned),
            dsh AS (
                SELECT DISTINCT doc_id, {" || ' ' || ".join(
                    f"w[i+{k}]" if k else "w[i]" for k in range(13)
                )} AS shingle
                FROM words, UNNEST(generate_series(1, len(w) - 12)) AS t(i)
                WHERE len(w) >= 13),
            hits AS (
                SELECT doc_id, COUNT(*) AS n FROM dsh
                JOIN evsh USING (shingle) GROUP BY doc_id)
            SELECT s.doc_id,
                   COALESCE(h.n, 0)::BIGINT AS n_hit_ngrams,
                   COALESCE(h.n, 0) > 0 AS contaminated
            FROM scanned s LEFT JOIN hits h ON h.doc_id = s.doc_id
        """,
        "dedup_clusters": f"""
            WITH RECURSIVE aug AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 5000000 AS doc_id, text FROM documents
                WHERE doc_id < 10
                UNION ALL
                SELECT * FROM (VALUES {", ".join(
                    f"({i}, '{t}')" for i, t in _CHAIN_DOCS
                )}) v(doc_id, text)),
            words AS (
                SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
                FROM aug),
            sh0 AS (
                SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                       AS shingle
                FROM words, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
                WHERE len(w) >= 3),
            hot AS (
                SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) > 1000),
            sh AS (
                SELECT doc_id, shingle FROM sh0
                WHERE shingle NOT IN (SELECT shingle FROM hot)),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
                FROM sh a JOIN sh b ON a.shingle = b.shingle
                                   AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
            pairs AS (
                SELECT id_a, id_b FROM inter
                JOIN sizes sa ON sa.doc_id = id_a
                JOIN sizes sb ON sb.doc_id = id_b
                WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= 0.4),
            edges AS (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION
                SELECT id_b AS src, id_a AS dst FROM pairs),
            nodes AS (SELECT DISTINCT src AS id FROM edges),
            reach(id, lbl) AS (
                SELECT id, id AS lbl FROM nodes
                UNION
                SELECT e.dst AS id, r.lbl FROM reach r
                JOIN edges e ON e.src = r.id),
            comp AS (SELECT id AS doc_id, MIN(lbl) AS cluster_id
                     FROM reach GROUP BY id),
            csize AS (SELECT cluster_id, COUNT(*) AS cluster_size
                      FROM comp GROUP BY cluster_id)
            SELECT c.doc_id, c.cluster_id, s.cluster_size,
                   c.doc_id = c.cluster_id AS is_keeper
            FROM comp c JOIN csize s USING (cluster_id)
        """,
        "line_dedup": """
            WITH base AS (
                SELECT doc_id,
                       regexp_replace(
                         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                         '((\\S+ ){7}\\S+) ', '\\1' || chr(10), 'g') AS t
                FROM documents),
            aug AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 3 = 0
                            THEN 'cookie notice please accept our cookies' || chr(10)
                            ELSE '' END
                       || t ||
                       CASE WHEN doc_id % 2 = 0
                            THEN chr(10) || 'subscribe to our newsletter today'
                            ELSE '' END AS t
                FROM base),
            lines AS (
                SELECT doc_id,
                       unnest(string_split(t, chr(10))) AS line,
                       unnest(generate_series(1, len(string_split(t, chr(10)))))
                         AS pos
                FROM aug),
            hot AS (
                SELECT line FROM lines WHERE length(line) > 0
                GROUP BY line HAVING COUNT(DISTINCT doc_id) > 5),
            flagged AS (
                SELECT l.doc_id, l.pos, l.line,
                       CASE WHEN h.line IS NULL THEN 1 ELSE 0 END AS keep
                FROM lines l LEFT JOIN hot h ON l.line = h.line)
            SELECT doc_id,
                   COALESCE(
                     string_agg(line, chr(10) ORDER BY pos)
                       FILTER (WHERE keep = 1),
                     '') AS clean_text,
                   SUM(keep)::BIGINT AS n_kept,
                   (COUNT(*) - SUM(keep))::BIGINT AS n_dropped
            FROM flagged GROUP BY doc_id
        """,
        "url_canonical_dedup": """
            WITH messy AS (
                SELECT 'HTTPS://WWW.Docs.Example.COM:443/d/'
                       || CAST(doc_id % 20 AS VARCHAR)
                       || '?utm_source=crawl&page=' || CAST(doc_id % 4 AS VARCHAR)
                       || '&utm_campaign=x#sec' || CAST(doc_id AS VARCHAR) AS u
                FROM documents),
            s1 AS (SELECT regexp_replace(u, '#.*$', '') AS u FROM messy),
            s2 AS (SELECT regexp_replace(u,
                     '[?&](utm_[a-z]+|fbclid|gclid|msclkid|mc_eid)=[^&#]*', '', 'g')
                     AS u FROM s1),
            s3 AS (SELECT regexp_replace(u, '^([^?]*?)&', '\\1?') AS u FROM s2),
            s4 AS (SELECT regexp_replace(regexp_replace(u, '\\?&', '?', 'g'),
                                         '[?&]$', '') AS u FROM s3),
            s5 AS (SELECT CASE WHEN regexp_extract(u,
                                 '^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)', 1) <> ''
                               THEN lower(regexp_extract(u,
                                 '^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)', 1))
                                 || regexp_replace(u,
                                 '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*', '')
                               ELSE u END AS u FROM s4),
            s6 AS (SELECT regexp_replace(u, '^(https?://)www\\.', '\\1') AS u FROM s5),
            s7 AS (SELECT regexp_replace(regexp_replace(u,
                     '^(http://[^/:]+):80(/|$)', '\\1\\2'),
                     '^(https://[^/:]+):443(/|$)', '\\1\\2') AS u FROM s6)
            SELECT u AS canonical_url, COUNT(*) AS c FROM s7 GROUP BY u
        """,
        # -- PII scrub: identical RE2-compatible regexes run in both engines
        #    over identically-augmented text; md5 pins the redacted bytes
        "pii_scrub": """
            WITH aug AS (
                SELECT doc_id,
                       text || ' contact user' || CAST(doc_id AS VARCHAR)
                            || '@example.com or +1 (555) 010-01'
                            || CAST(doc_id AS VARCHAR)
                            || ' via 192.168.0.1 now' AS t
                FROM documents)
            SELECT doc_id,
                   len(regexp_extract_all(t,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::INT
                     AS n_emails,
                   len(regexp_extract_all(t,
                       '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b'))::INT AS n_ips,
                   len(regexp_extract_all(t,
                       '\\+?\\d[\\d\\s().-]{6,}\\d'))::INT AS n_phones,
                   md5(regexp_replace(regexp_replace(regexp_replace(t,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                       '[EMAIL]', 'g'),
                       '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '[IP]', 'g'),
                       '\\+?\\d[\\d\\s().-]{6,}\\d', '[PHONE]', 'g'))
                     AS scrubbed_md5
            FROM aug
        """,
        "repetition_stats": """
            SELECT doc_id,
                   CASE WHEN len(string_split_regex(lower(trim(text)), '\\s+')) > 0
                        THEN ROUND(1.0 -
                             len(list_distinct(string_split_regex(lower(trim(text)), '\\s+')))
                             * 1.0 /
                             len(string_split_regex(lower(trim(text)), '\\s+')), 6)
                        ELSE 0.0 END::DOUBLE AS rep_ratio
            FROM documents
        """,
        # -- md5-variant simhash: DuckDB reproduces the 60-bit token hash,
        #    the per-bit votes, and the sign packing bit-for-bit
        "simhash": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
                FROM documents),
            h AS (
                SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv
                FROM toks),
            votes AS (
                SELECT doc_id, i,
                       SUM(CASE WHEN (hv >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
                FROM h, UNNEST(generate_series(0, 59)) AS t(i)
                GROUP BY doc_id, i)
            SELECT doc_id,
                   SUM(CASE WHEN v > 0 THEN (1::BIGINT << i)
                            ELSE 0::BIGINT END)::BIGINT AS simhash
            FROM votes GROUP BY doc_id
        """,
        # -- near-dup pairs: oracle verifies via the exact O(n^2) Hamming scan
        #    (fine at sf0.01); the engine's banded join must find the same set
        "simhash_neardups": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
                FROM documents),
            h AS (
                SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv
                FROM toks),
            votes AS (
                SELECT doc_id, i,
                       SUM(CASE WHEN (hv >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
                FROM h, UNNEST(generate_series(0, 59)) AS t(i)
                GROUP BY doc_id, i),
            sig AS (
                SELECT doc_id,
                       SUM(CASE WHEN v > 0 THEN (1::BIGINT << i)
                                ELSE 0::BIGINT END)::BIGINT AS simhash
                FROM votes GROUP BY doc_id)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   bit_count(xor(a.simhash, b.simhash))::INT AS hamming
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        """,
        # -- full minhash+banding pipeline, affine variant: shingles -> ONE
        #    md5 -> 32 affine minhashes mod 2^31-1 (exact integer math both
        #    engines) -> band hash (md5 of comma-joined sig decimals) -> pairs
        "minhash_lsh_pairs": rf"""
            WITH words AS (
                SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
                FROM documents),
            sh0 AS (
                SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                FROM words, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
                WHERE len(w) >= 3),
            sh AS (
                SELECT doc_id,
                       ('0x' || substr(md5(shingle), 1, 15))::BIGINT
                         % 2147483647 AS h0
                FROM sh0),
            params(i, a, b) AS (VALUES {_affine_values()}),
            sigs AS (
                SELECT doc_id, p.i, MIN((p.a * h0 + p.b) % 2147483647) AS sig
                FROM sh, params p GROUP BY doc_id, p.i),
            bands AS (
                SELECT doc_id, i // 4 AS band_id,
                       md5(string_agg(CAST(sig AS VARCHAR), ',' ORDER BY i))
                         AS band_hash
                FROM sigs GROUP BY doc_id, i // 4)
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM bands a
            JOIN bands b ON a.band_id = b.band_id
                        AND a.band_hash = b.band_hash
                        AND a.doc_id < b.doc_id
            ORDER BY id_a, id_b
        """,
        # -- LSH+verify pipeline invariant: on this corpus LSH recall at 0.5
        #    is 1, so the verified output equals the exact Jaccard method
        "minhash_lsh_verified": f"""
            WITH words AS (
                SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
                FROM documents),
            sh0 AS (
                SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                FROM words, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
                WHERE len(w) >= 3),
            hot AS (
                SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) > 1000),
            sh AS (
                SELECT doc_id, shingle FROM sh0
                WHERE shingle NOT IN (SELECT shingle FROM hot)),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
                FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
            SELECT id_a, id_b,
                   ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 6)::DOUBLE
                     AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
        """,
        # -- opaque-binary features are sha256-derived; DuckDB recomputes them
        "media_features": """
            SELECT CAST(doc_id AS VARCHAR) AS url,
                   CASE WHEN starts_with(text, '%PDF-') THEN 'pdf_scan'
                        ELSE 'image' END AS media_type,
                   1 + ('0x' || substr(sha256(text), 1, 2))::INT AS width,
                   1 + ('0x' || substr(sha256(text), 3, 2))::INT AS height,
                   octet_length(encode(text))::INT AS n_bytes,
                   ('0x' || substr(sha256(text), 1, 2))::INT AS feat0_byte
            FROM documents
        """,
        # -- stub-encoder embeddings: component j = sha256 byte j / 255
        "doc_embeddings": """
            WITH b AS (
                SELECT doc_id,
                       ('0x' || substr(sha256(text), 2*j - 1, 2))::BIGINT AS v
                FROM documents, UNNEST(generate_series(1, 32)) AS t(j))
            SELECT doc_id, 32::INT AS dim, SUM(v)::BIGINT AS byte_sum
            FROM b GROUP BY doc_id
        """,
        # -- the analyzer runs on pages rendered deterministically from
        #    documents (corpus.doc_to_page), so its outputs are closed-form
        #    SQL over (doc_id, text): payload length and pdf text-layer
        #    length are exact arithmetic over the word list
        "analyzer_stats": """
            WITH d AS (
                SELECT doc_id, text,
                       list_filter(string_split_regex(trim(text), '\\s+'),
                                   w -> w <> '') AS ws
                FROM documents),
            m AS (
                SELECT doc_id, text,
                       doc_id % 10 AS m10,
                       array_to_string(ws, ' ') AS joined,
                       len(ws) AS nw
                FROM d),
            pdfc AS (
                SELECT *,
                       CASE WHEN nw = 0 THEN len('doc ' || CAST(doc_id AS VARCHAR))
                            ELSE len(joined) - (CEIL(nw / 6.0)::INT - 1)
                       END AS pdf_chars
                FROM m),
            a AS (
                SELECT
                    CASE WHEN m10 <= 6 THEN 'html'
                         WHEN m10 = 9 THEN 'scanned'
                         WHEN pdf_chars >= 50 THEN 'pdf'
                         ELSE 'scanned' END AS page_type,
                    CASE WHEN m10 <= 6 THEN
                             672 + 3 * len(CAST(doc_id AS VARCHAR))
                                 + 6 * GREATEST(1, CEIL(nw / 12.0)::INT)
                                 + octet_length(encode(joined)) + 1
                         WHEN m10 = 9 THEN 5 + len(CAST(doc_id AS VARCHAR))
                         ELSE pdf_chars END AS text_layer_chars,
                    CASE WHEN m10 <= 6 THEN position('<img' IN lower(text)) > 0
                         ELSE FALSE END AS has_images
                FROM pdfc)
            SELECT page_type, COUNT(*) AS c,
                   ROUND(AVG(text_layer_chars), 2)::DOUBLE AS avg_text_chars,
                   SUM(CASE WHEN has_images THEN 1 ELSE 0 END)::BIGINT
                     AS n_with_images
            FROM a GROUP BY page_type
        """,
        "route_explain": """
            WITH d AS (
                SELECT doc_id, text,
                       list_filter(string_split_regex(trim(text), '\\s+'),
                                   w -> w <> '') AS ws
                FROM documents),
            m AS (
                SELECT doc_id, doc_id % 10 AS m10,
                       array_to_string(ws, ' ') AS joined, len(ws) AS nw,
                       position('<form' IN lower(text)) > 0
                         OR position('<input' IN lower(text)) > 0 AS text_has_form
                FROM d),
            r AS (
                SELECT CASE
                         WHEN m10 <= 6 AND text_has_form THEN 'nanonets'
                         WHEN m10 <= 6 THEN 'deepseek'
                         WHEN m10 = 9 THEN 'deepseek-ocr'
                         WHEN (CASE WHEN nw = 0
                                    THEN len('doc ' || CAST(doc_id AS VARCHAR))
                                    ELSE len(joined) - (CEIL(nw / 6.0)::INT - 1)
                               END) < 50 THEN 'deepseek-ocr'
                         ELSE 'deepseek' END AS route
                FROM m)
            SELECT route,
                   CASE route
                        WHEN 'nanonets' THEN 'forms detected -> form-specialized route'
                        WHEN 'deepseek-ocr' THEN 'low native text ratio -> OCR route'
                        ELSE 'standard document -> default route'
                   END AS route_reason,
                   COUNT(*) AS c
            FROM r GROUP BY route, route_reason
        """,
        # robots.txt verdicts: the oracle replays the GENERIC evaluator —
        # same host/path extraction regexes, same pattern->RE2 compile
        # chain (escape metachars except * -> .*, re-anchor trailing \$),
        # same agent-group shadowing and longest/allow-wins/pattern-desc
        # argmax — over the same literal rules VALUES
        "robots_filter": r"""
            WITH pages AS (
                SELECT doc_id,
                       'https://' ||
                       CASE doc_id % 4
                            WHEN 0 THEN 'docs.example.com'
                            WHEN 1 THEN 'api.example.com'
                            WHEN 2 THEN 'closed.example.net'
                            ELSE 'norules.example.io' END ||
                       CASE doc_id % 7
                            WHEN 0 THEN '/private/doc' || doc_id
                            WHEN 1 THEN '/private/pub/doc' || doc_id
                            WHEN 2 THEN '/raw' || doc_id || '.bin'
                            WHEN 3 THEN '/exact'
                            WHEN 4 THEN '/exactly' || doc_id
                            WHEN 5 THEN '/internal/doc' || doc_id
                            ELSE '/ok/doc' || doc_id END AS url
                FROM documents),
            keyed AS (
                SELECT doc_id, url,
                       lower(regexp_extract(url,
                           '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1)) AS host,
                       CASE WHEN regexp_extract(url,
                           '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([/?].*)?$', 1) = ''
                            THEN '/'
                            ELSE regexp_extract(url,
                           '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([/?].*)?$', 1)
                       END AS path
                FROM pages),
            rules(host, agent, allow, pattern) AS (VALUES
                ('docs.example.com',   '*',         FALSE, '/private/'),
                ('docs.example.com',   '*',         TRUE,  '/private/pub/'),
                ('docs.example.com',   '*',         FALSE, '/raw*.bin'),
                ('docs.example.com',   '*',         FALSE, '/exact$'),
                ('api.example.com',    '*',         FALSE, '/'),
                ('api.example.com',    'gonovabot', FALSE, '/internal/'),
                ('closed.example.net', '*',         FALSE, '/')),
            ranked AS (
                SELECT host, allow, pattern,
                       CASE WHEN lower(agent) = 'gonovabot' THEN 0 ELSE 1 END AS rnk
                FROM rules WHERE lower(agent) IN ('gonovabot', '*')),
            grp AS (
                SELECT host, allow, pattern,
                       '^' || regexp_replace(
                                replace(
                                  regexp_replace(pattern,
                                    '([\\.\^\$\+\?\(\)\{\}\[\]\|])', '\\\1', 'g'),
                                  '*', '.*'),
                                '\\\$$', '$') AS rx
                FROM (SELECT *, MIN(rnk) OVER (PARTITION BY host) AS best
                      FROM ranked)
                WHERE rnk = best),
            matched AS (
                SELECT k.doc_id, r.allow, r.pattern,
                       ROW_NUMBER() OVER (
                           PARTITION BY k.doc_id
                           ORDER BY length(r.pattern) DESC, r.allow DESC,
                                    r.pattern DESC) AS rn
                FROM keyed k
                JOIN grp r ON k.host = r.host AND regexp_matches(k.path, r.rx))
            SELECT k.doc_id, k.url,
                   COALESCE(m.allow, TRUE) AS allowed,
                   m.pattern AS matched_pattern
            FROM keyed k
            LEFT JOIN (SELECT * FROM matched WHERE rn = 1) m USING (doc_id)
        """,
        # interpolated bigram LM trained on the doc_id%10==0 head and
        # scored over every doc — training and scoring both replayed;
        # (1.0 - 0.9) is the identical IEEE subtraction Spark computes
        "lm_perplexity": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                   w -> w <> '') AS ws
                FROM documents),
            flat AS (
                SELECT doc_id, unnest(ws) AS w,
                       generate_subscripts(ws, 1) AS i
                FROM toks),
            bg AS (
                SELECT doc_id, w AS w1,
                       lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
                FROM flat
                QUALIFY w2 IS NOT NULL),
            train_uni AS (
                SELECT w, COUNT(*) AS c FROM flat
                WHERE doc_id % 10 = 0 GROUP BY w),
            train_bi AS (
                SELECT w1, w2, COUNT(*) AS c12 FROM bg
                WHERE doc_id % 10 = 0 GROUP BY w1, w2),
            scal AS (
                SELECT SUM(c)::DOUBLE AS n, COUNT(*)::DOUBLE AS v
                FROM train_uni),
            scored AS (
                SELECT b.doc_id,
                       ln(0.9 * (CASE WHEN tb.c12 IS NOT NULL
                                      THEN tb.c12::DOUBLE / u1.c::DOUBLE
                                      ELSE 0.0 END)
                          + (1.0 - 0.9) *
                            ((COALESCE(u2.c, 0)::DOUBLE + 1.0)
                             / (scal.n + scal.v))) AS lp
                FROM bg b
                LEFT JOIN train_bi tb ON b.w1 = tb.w1 AND b.w2 = tb.w2
                LEFT JOIN train_uni u1 ON b.w1 = u1.w
                LEFT JOIN train_uni u2 ON b.w2 = u2.w
                CROSS JOIN scal)
            SELECT doc_id, COUNT(*) AS n_bigrams,
                   ROUND(-AVG(lp), 4)::DOUBLE AS nll
            FROM scored GROUP BY doc_id
        """,
        # anchor-text aggregation: per-(target, anchor) counts then a
        # per-target argmax over non-empty anchors (count desc, anchor
        # desc — the same lexicographic struct-max order Spark uses)
        "anchor_texts": """
            WITH links AS (
                SELECT 'https://site' || (doc_id % 20) ||
                       '.example.org/page' || (doc_id % 50) AS target,
                       CASE doc_id % 5
                            WHEN 0 THEN ''
                            WHEN 1 THEN 'home'
                            WHEN 2 THEN 'read more'
                            WHEN 3 THEN 'docs ' || (doc_id % 3)
                            ELSE 'home' END AS anchor
                FROM documents),
            pa AS (
                SELECT target, anchor, COUNT(*) AS c
                FROM links GROUP BY target, anchor),
            tot AS (
                SELECT target, SUM(c)::BIGINT AS n_links,
                       COUNT(*) AS n_anchors
                FROM pa GROUP BY target),
            top AS (
                SELECT target, anchor AS top_anchor,
                       c AS top_anchor_links,
                       ROW_NUMBER() OVER (
                           PARTITION BY target
                           ORDER BY c DESC, anchor DESC) AS rn
                FROM pa WHERE anchor <> '')
            SELECT t.target, t.n_links, t.n_anchors,
                   p.top_anchor, p.top_anchor_links
            FROM tot t
            LEFT JOIN (SELECT * FROM top WHERE rn = 1) p USING (target)
        """,
        # -- Frontier politeness schedule: same planted frontier, same
        #    md5-low-60 fetcher hash, same window (priority desc, url) —
        #    the offset product is exact because the planted delays are
        #    binary fractions (0.5 / 2.0 / default 1.0).
        "frontier_schedule": f"""
            WITH f AS (
                SELECT 'https://' || host || '/d/' || doc_id AS url,
                       host,
                       doc_id % 97 AS priority
                FROM (SELECT doc_id,
                             CASE doc_id % 5
                               WHEN 0 THEN 'docs.example.com'
                               WHEN 1 THEN 'sub.spam.example.net'
                               WHEN 2 THEN 'spam.example.net'
                               WHEN 3 THEN 'notspam.example.net'
                               ELSE 'ads.example.org' END AS host
                      FROM documents)),
            delays(host, delay_sec) AS (VALUES
                {", ".join(f"('{h}', {d!r})" for h, d in _FETCH_DELAYS)}),
            r AS (
                SELECT url, host, priority,
                       row_number() OVER (
                           PARTITION BY host
                           ORDER BY priority DESC, url) AS fetch_rank
                FROM f)
            SELECT r.url, r.host, r.priority,
                   (('0x' || substr(md5(r.host), 1, 15))::BIGINT % 8)::INT
                       AS fetcher,
                   r.fetch_rank,
                   ((r.fetch_rank - 1) *
                    COALESCE(d.delay_sec, 1.0))::DOUBLE AS fetch_offset_sec
            FROM r LEFT JOIN delays d ON d.host = r.host
        """,
        # -- Bloom frontier, affine variant: the oracle replays the SAME
        #    k affine bit positions (one md5 -> (a*h0+b) mod p mod m) but
        #    skips the int64 word packing — membership over the DISTINCT
        #    set-position set is bit-for-bit the packed-word semantics,
        #    so verdicts (false positives included) hash-match exactly.
        "bloom_frontier": f"""
            WITH params(i, a, b) AS (VALUES {_affine_values(_BLOOM_K)}),
            seen AS (
                SELECT 'https://site' || (doc_id % 20) ||
                       '.example.org/doc' || doc_id AS url
                FROM documents),
            cand AS (
                SELECT url FROM seen WHERE url LIKE '%0'
                UNION ALL
                SELECT 'https://new.example.org/n' || doc_id AS url
                FROM documents WHERE doc_id % 5 = 0),
            seen_pos AS (
                SELECT DISTINCT
                       ((a * (('0x' || substr(md5(url), 1, 15))::BIGINT
                              % 2147483647) + b)
                        % 2147483647) % {_BLOOM_M} AS pos
                FROM seen, params),
            cand_pos AS (
                SELECT url,
                       ((a * (('0x' || substr(md5(url), 1, 15))::BIGINT
                              % 2147483647) + b)
                        % 2147483647) % {_BLOOM_M} AS pos
                FROM cand, params)
            SELECT c.url, COUNT(s.pos) = {_BLOOM_K} AS probably_seen
            FROM cand_pos c LEFT JOIN seen_pos s USING (pos)
            GROUP BY c.url
        """,
        # -- per-line boilerplate verdict replayed via DuckDB list lambdas;
        #    COALESCE guards array_to_string([]) -> NULL (Spark array_join
        #    of an empty array is '') — same contract as remove_dup_spans
        "boilerplate": f"""
            WITH d AS (
                SELECT doc_id,
                       'Home | About | Contact' || chr(10) ||
                       'We use cookies to improve your browsing experience on this site.'
                       || chr(10) || COALESCE(text, '') || chr(10) ||
                       CASE WHEN doc_id % 3 = 0
                            THEN 'SUBSCRIBE NOW TO OUR NEWSLETTER TODAY'
                            ELSE 'Read the documentation for more details about the parser here.'
                       END || chr(10) ||
                       '© 2026 Example Corp. All rights reserved.' AS t
                FROM documents),
            l AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM d),
            k AS (SELECT doc_id, len(ls)::INT AS n_lines,
                         list_filter(ls, x -> {_bp_verdict_sql('x')}) AS kept
                  FROM l)
            SELECT doc_id, n_lines, len(kept)::INT AS n_kept,
                   length(COALESCE(array_to_string(kept, chr(10)), ''))::INT
                     AS clean_len,
                   substr(COALESCE(array_to_string(kept, chr(10)), ''), 1, 80)
                     AS clean_head
            FROM k
        """,
        # -- DSIR: hashed uni+bigram buckets (one md5 each), Laplace-
        #    smoothed target/raw models, per-doc summed log ratio.  The
        #    raw model covers every probe bucket (probes COME from raw),
        #    so the unseen-bucket default never fires and the oracle
        #    needs no fallback arm.  4096.0 additions replicate the
        #    engine's python-float denominators digit-for-digit.
        "dsir_weights": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                   w -> w <> '') AS ws
                FROM documents),
            flat AS (
                SELECT doc_id, unnest(ws) AS w,
                       generate_subscripts(ws, 1) AS i
                FROM toks),
            bg AS (
                SELECT doc_id, w AS w1,
                       lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
                FROM flat
                QUALIFY w2 IS NOT NULL),
            feats AS (
                SELECT doc_id, w AS f FROM flat
                UNION ALL
                SELECT doc_id, w1 || ' ' || w2 AS f FROM bg),
            fb AS (
                SELECT doc_id,
                       ('0x' || substr(md5(f), 1, 15))::BIGINT % 4096 AS b
                FROM feats),
            t AS (SELECT b, COUNT(*) AS ct FROM fb
                  WHERE doc_id % 10 = 0 GROUP BY b),
            r AS (SELECT b, COUNT(*) AS cr FROM fb GROUP BY b),
            scal AS (
                SELECT (SELECT SUM(ct) FROM t)::DOUBLE + 4096.0 AS dt,
                       (SELECT SUM(cr) FROM r)::DOUBLE + 4096.0 AS dr),
            scored AS (
                SELECT fb.doc_id,
                       ln((COALESCE(t.ct, 0)::DOUBLE + 1.0) / scal.dt)
                       - ln((r.cr::DOUBLE + 1.0) / scal.dr) AS lr
                FROM fb
                LEFT JOIN t USING (b)
                JOIN r USING (b)
                CROSS JOIN scal)
            SELECT doc_id, COUNT(*) AS n_feats,
                   ROUND(SUM(lr), 4)::DOUBLE AS logw
            FROM scored GROUP BY doc_id
        """,
    }
    ivf = _ivf_oracle_sql()
    if ivf is not None:
        out["ivf_topk"] = ivf
    mix = _topic_mix_oracle_sql()
    if mix is not None:
        out["topic_mix"] = mix
    sd = _semantic_dedup_oracle_sql()
    if sd is not None:
        out["semantic_dedup"] = sd
    return out


def _semantic_dedup_oracle_sql() -> str | None:
    """Within-cell smaller-id NOT-EXISTS over the SAME materialized
    SemDeDup index the Spark query reads (see _ivf_oracle_sql for the
    index-availability protocol).  Cosine rounded to 4dp on both sides —
    the cross-engine float contract every cosine query here uses."""
    import os

    sf_dir = os.environ.get("GONOVA_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    try:
        from gonova_document_parser_spark.functions.similarity import (
            ivf_index_ready,
        )

        path = _semdedup_index_path(sf_dir)
        if not ivf_index_ready(path):
            from gonova_document_parser_spark.session import get_spark

            spark = SparkSession.getActiveSession() or get_spark(
                master="local[8]", shuffle_partitions=16
            )
            path = _ensure_semdedup_index(spark, sf_dir, n_cells=16)
    except Exception:  # no Spark available here -> keep the rows-only check
        return None
    return f"""
        WITH v AS (
            SELECT vec_id, cell::INT AS cell, embedding::DOUBLE[] AS e
            FROM read_parquet('{path}/vectors/*/*.parquet',
                              hive_partitioning=1))
        SELECT a.vec_id, a.cell,
               NOT EXISTS (
                   SELECT 1 FROM v b
                   WHERE b.cell = a.cell AND b.vec_id < a.vec_id
                     AND ROUND(list_cosine_similarity(b.e, a.e), 4) >= 0.95
               ) AS keep
        FROM v a
    """


def _topic_mix_oracle_sql() -> str | None:
    """Per-cell histogram over the same materialized IVF index (see
    _ivf_oracle_sql for the index-availability protocol).  Integer ppm
    (n * 1e6 // total) keeps the comparison float-free; DuckDB's
    SUM(BIGINT) is HUGEINT, hence the explicit BIGINT casts."""
    import os

    sf_dir = os.environ.get("GONOVA_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    try:
        from gonova_document_parser_spark.functions.similarity import (
            ivf_index_ready,
        )

        path = _ivf_index_path(sf_dir)
        if not ivf_index_ready(path):
            from gonova_document_parser_spark.session import get_spark

            spark = SparkSession.getActiveSession() or get_spark(
                master="local[8]", shuffle_partitions=16
            )
            path = _ensure_ivf_index(spark, sf_dir, n_cells=16)
    except Exception:  # no Spark available here -> keep the rows-only check
        return None
    return f"""
        WITH c AS (
            SELECT cell::INT AS cell, COUNT(*) AS n_vectors
            FROM read_parquet('{path}/vectors/*/*.parquet', hive_partitioning=1)
            GROUP BY cell)
        SELECT cell,
               n_vectors::BIGINT AS n_vectors,
               ((n_vectors * 1000000) // (SELECT SUM(n_vectors) FROM c))::BIGINT
                 AS ppm
        FROM c
    """
