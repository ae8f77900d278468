"""spark-submit entrypoint: end-to-end training-data curation.

Composes the engine's operators into the pipeline a pretraining-data
user actually runs over a crawl (the reference stops at per-document
extraction; this is the corpus-level continuation every LLM pipeline
needs — see COVERAGE.md "training-data pipeline" tier):

  pages (url, warc_ts, html, ...)
    1. governance:  domain blocklist (suffix match) + meta-robots noindex
    2. extraction:  html/pdf -> text (the byte-exact reference pipeline)
    3. quality:     Gopher rules + heuristic language ID
    4. line dedup:  corpus-wide boilerplate-line removal (CCNet-style)
    5. exact dedup: md5-fingerprint keeper per duplicate group
    5a. decontamination (opt-in, ``eval_docs``): drop docs sharing any
        13-gram with the evaluation set (broadcast semi-join — the eval
        set is KBs against the corpus's TBs)
    5b. span surgery (opt-in, ``span_surgery=True``): corpus-wide
        exact-substring removal — repeats of a >=``window``-token span
        lose the span, first occurrence survives.  Replaces ``text``
        with the normalized-token reassembly, so downstream token
        budgets price the post-surgery stream.  Costs one extra
        16-byte-key shuffle pair over the corpus; off by default.
    6. domain cap:  skew-split anti-domination quota per host
    7. split:       deterministic hash train/val/test assignment
    8. packing:     token-budget sequence ids for the train split

Survivorship metrics come from ONE aggregation over the final annotated
frame (conditional sums — no per-stage count() actions, no extra corpus
passes); every decision is a deterministic function of the row, so
re-runs and task retries reproduce identical output (asserted by the
two-run fingerprint test).

Usage:
  spark-submit --py-files gonova.zip jobs/curate_job.py \
      <pages_parquet> <output_path> [budget] [max_docs_per_host] \
      [--eval-set <eval_parquet>] [--span-surgery]
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import DataFrame, SparkSession, functions as F


def curate(
    spark: SparkSession,
    pages: DataFrame,
    output_path: str,
    blocked_domains: list[str] | None = None,
    budget: int = 2048,
    max_per_host: int = 100_000,
    hot_line_max_docs: int = 20,
    eval_docs: DataFrame | None = None,
    contamination_ngram: int = 13,
    span_surgery: bool = False,
    span_window: int = 10,
) -> dict:
    from gonova_document_parser_spark.functions.dedup import (
        exact_dup_groups,
        ngram_contamination,
        remove_duplicated_spans,
    )
    from gonova_document_parser_spark.functions.governance import (
        domain_blocked_expr,
        robots_noindex_expr,
    )
    from gonova_document_parser_spark.functions.lines import line_dedup
    from gonova_document_parser_spark.functions.sampling import (
        domain_cap,
        hash_split,
        pack_sequences,
    )
    from gonova_document_parser_spark.functions.textstats import (
        gopher_flags,
        lang_id_expr,
        quality_score_expr,
    )
    from gonova_document_parser_spark.operators.extract import extract_pages
    from gonova_document_parser_spark.plans.partitioning import host_of

    blocked_domains = list(blocked_domains or [])

    # 1. governance gate BEFORE extraction: blocked/noindex pages must not
    # pay the (dominant) extraction cost.  Both are pure filters.
    # binary->string CAST, not decode(): ANSI decode raises on malformed
    # bytes (real crawls have them); the cast substitutes U+FFFD, which is
    # exactly right for a regex probe.  Flags coalesce to False: an
    # unparseable url host or NULL html makes the predicate NULL, and a
    # bare where() would silently drop the row while the metrics counted
    # it in neither bucket — ungateable pages ADMIT (extraction decides).
    gov = pages.select(
        "*",
        F.coalesce(domain_blocked_expr(blocked_domains), F.lit(False)).alias(
            "_blocked"
        ),
        F.coalesce(
            robots_noindex_expr(F.col("html").cast("string")), F.lit(False)
        ).alias("_noindex"),
    )
    admitted = gov.where(~F.col("_blocked") & ~F.col("_noindex")).drop(
        "_blocked", "_noindex"
    )

    # 2. extraction (narrow Arrow map; only url/warc_ts/html cross into it)
    extracted = extract_pages(admitted).where(F.col("success"))

    # 3-5. corpus-level text curation on a stable numeric id (url hash —
    # deterministic, collision-safe enough for dedup keys at this tier;
    # the md5 fingerprint below is the exact-dup authority)
    docs = extracted.select(
        F.xxhash64("url").alias("doc_id"),
        "url",
        F.col("extracted_text").alias("text"),
    )
    cleaned = line_dedup(docs, max_docs=hot_line_max_docs).join(
        docs.select("doc_id", "url"), "doc_id"
    )
    gf = gopher_flags("clean_text")
    scored = cleaned.select(
        "doc_id",
        "url",
        F.col("clean_text").alias("text"),
        lang_id_expr("clean_text").alias("lang"),
        F.round(quality_score_expr("clean_text"), 6).alias("quality"),
        gf["keep"].alias("_gopher_keep"),
    ).where(F.col("_gopher_keep"))
    groups = exact_dup_groups(scored)  # (fp, n_dups, keeper)
    unique = scored.join(
        groups.select(F.col("keeper").alias("doc_id")), "doc_id", "left_semi"
    )

    # 5a. benchmark decontamination: drop any doc sharing a 13-gram with
    # the eval set.  Runs AFTER exact dedup (fewer docs to shingle) and
    # BEFORE the mix construction so a contaminated doc can't occupy a
    # domain-cap slot.  The eval shingle set broadcasts; the corpus side
    # stays a narrow explode + broadcast semi-join (see ngram_contamination).
    contam = None
    if eval_docs is not None:
        # localCheckpoint: the verdicts frame (3 narrow cols, one row per
        # unique doc) feeds BOTH the anti-join in the main lineage and the
        # dropped_contaminated metric — without it the shingle broadcast
        # join would execute twice
        contam = ngram_contamination(
            unique, eval_docs, n=contamination_ngram
        ).localCheckpoint(eager=False)
        unique = unique.join(
            contam.where(F.col("contaminated")).select("doc_id"),
            "doc_id",
            "left_anti",
        )

    # 5b. exact-substring corpus surgery: repeats of a >= span_window-token
    # span lose the span (first occurrence corpus-wide survives verbatim).
    # text becomes the normalized-token reassembly — the representation
    # every dedup operator here tokenizes to — so packing budgets price
    # the post-surgery stream.  quality/lang keep their gating-stage
    # values (scored pre-surgery) by design: they justified admission.
    if span_surgery:
        surg = remove_duplicated_spans(
            unique, window=span_window
        ).select("doc_id", "clean_text")
        unique = unique.drop("text").join(surg, "doc_id").withColumnRenamed(
            "clean_text", "text"
        )

    # 6-8. mix construction
    capped = domain_cap(
        unique.withColumn("source", host_of("url")),
        max_per_host,
        key_col="source",
        order_col="quality",
    )
    # one materialization point: pack_sequences' driver-side prefix-offset
    # collect executes the pipeline; without the checkpoint the final
    # write would re-run the whole DAG (extraction included) a second
    # time — shuffle files don't get reused across separate jobs
    split = hash_split(
        capped, {"train": 0.98, "val": 0.01, "test": 0.01}
    ).localCheckpoint(eager=False)
    packed = pack_sequences(
        split.where(F.col("split") == "train"), budget
    ).select("doc_id", "chunk_id")
    final = split.join(packed, "doc_id", "left")

    # write-task fan-out: hashing on split ALONE funnels ~98% of the corpus
    # (the train split) through one task — a straggler/memory wall at scale.
    # Adding a doc_id bucket keeps "each task writes exactly one split
    # directory" (partitionBy still routes by value) while spreading the
    # train split across n_write parallel writers.
    n_write = max(spark.sparkContext.defaultParallelism, 2)
    (
        final.repartition(
            n_write,
            F.col("split"),
            F.pmod(F.xxhash64("doc_id"), F.lit(n_write)),
        )
        .write.partitionBy("split")
        .mode("overwrite")
        .parquet(output_path)
    )

    # survivorship metrics: one aggregate per stage frame (each is a
    # single job over the already-built lineage; counts are conditional
    # sums, never per-row collects)
    g = gov.agg(
        F.count(F.lit(1)).alias("input"),
        F.sum(F.col("_blocked").cast("long")).alias("blocked"),
        F.sum((~F.col("_blocked") & F.col("_noindex")).cast("long")).alias("noindex"),
    ).collect()[0]
    dropped_contaminated = 0
    if contam is not None:
        dropped_contaminated = int(
            contam.agg(
                F.sum(F.col("contaminated").cast("long")).alias("c")
            ).collect()[0]["c"]
            or 0
        )
    out = spark.read.parquet(output_path)
    o = out.agg(
        F.count(F.lit(1)).alias("kept"),
        F.countDistinct("chunk_id").alias("train_chunks"),
        F.sum((F.col("split") == "train").cast("long")).alias("train_docs"),
    ).collect()[0]
    return {
        "input_pages": g["input"],
        "dropped_blocked": int(g["blocked"] or 0),
        "dropped_noindex": int(g["noindex"] or 0),
        "dropped_contaminated": dropped_contaminated,
        "curated_docs": o["kept"],
        "train_docs": int(o["train_docs"] or 0),
        "train_chunks": int(o["train_chunks"] or 0),
        "output_path": output_path,
    }


def main(argv: list[str]) -> None:
    from gonova_document_parser_spark.session import get_spark

    span_surgery = "--span-surgery" in argv
    eval_path = None
    if "--eval-set" in argv:
        i = argv.index("--eval-set")
        if i + 1 >= len(argv):
            raise SystemExit(
                "usage: curate_job.py <pages> <out> [budget] [max_per_host] "
                "[--eval-set PATH] [--span-surgery] (--eval-set needs a PATH)"
            )
        eval_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    argv = [a for a in argv if a != "--span-surgery"]
    source, output = argv[0], argv[1]
    budget = int(argv[2]) if len(argv) > 2 else 2048
    max_per_host = int(argv[3]) if len(argv) > 3 else 100_000
    spark = get_spark(app_name="gonova-curate")
    spark.sparkContext.setLogLevel("WARN")
    pages = spark.read.parquet(source)
    eval_docs = None
    if eval_path is not None:
        # any parquet with a text column works; benchmarks are tiny
        eval_docs = spark.read.parquet(eval_path).select("text")
    summary = curate(
        spark,
        pages,
        output,
        budget=budget,
        max_per_host=max_per_host,
        eval_docs=eval_docs,
        span_surgery=span_surgery,
    )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
