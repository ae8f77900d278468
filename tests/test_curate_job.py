"""End-to-end curation pipeline (jobs/curate_job.py): the training-data
operators composed the way a pretraining user runs them — governance ->
extraction -> quality -> line dedup -> exact dedup -> domain cap ->
split -> packing — with deterministic two-run output identity."""

import pyspark.sql.functions as F

from gonova_document_parser_spark.corpus import generate_pages
from jobs.curate_job import curate


def _fingerprint(spark, path):
    df = spark.read.parquet(path)
    return (
        df.agg(
            F.coalesce(
                F.bit_xor(F.xxhash64("url", "text", "split")), F.lit(0)
            ).alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0],
        df,
    )


def test_curate_pipeline_deterministic_and_monotone(spark, tmp_path):
    pages = generate_pages(spark, 400, num_partitions=4)
    # plant governance violations on top of the synthetic corpus: a
    # blocked-domain page and a noindex page (valid extractable html)
    extra = spark.createDataFrame(
        [
            (
                "https://spam.example.net/x",
                b"<html><body><div><p>"
                + b"blocked-domain page with plenty of words " * 8
                + b"</p></div></body></html>",
            ),
            (
                "https://docs.example.com/noidx",
                b'<html><head><meta name="robots" content="noindex"></head>'
                b"<body><div><p>"
                + b"opted out of indexing but otherwise fine " * 8
                + b"</p></div></body></html>",
            ),
        ],
        "url string, html binary",
    ).select(
        "url",
        F.lit(None).cast("timestamp").alias("warc_ts"),
        "html",
        F.lit("").alias("text"),
        F.lit("und").alias("lang"),
    )
    pages = pages.unionByName(extra)

    out1 = str(tmp_path / "cur1")
    m1 = curate(
        spark, pages, out1, blocked_domains=["spam.example.net"],
        budget=256, max_per_host=200,
    )
    assert m1["input_pages"] == 402
    assert m1["dropped_blocked"] == 1
    assert m1["dropped_noindex"] == 1
    # survivorship is monotone: curated <= admitted input
    assert 0 < m1["curated_docs"] <= 400
    assert m1["train_docs"] <= m1["curated_docs"]
    assert m1["train_chunks"] >= 1

    fp1, df1 = _fingerprint(spark, out1)
    # split dirs exist and carry the expected schema
    cols = set(df1.columns)
    assert {"doc_id", "url", "text", "lang", "quality", "split"} <= cols
    assert {r["split"] for r in df1.select("split").distinct().collect()} <= {
        "train", "val", "test"
    }
    # every train doc got a chunk id; non-train docs have none
    assert df1.where(
        (F.col("split") == "train") & F.col("chunk_id").isNull()
    ).count() == 0
    assert df1.where(
        (F.col("split") != "train") & F.col("chunk_id").isNotNull()
    ).count() == 0
    # no blocked/noindex url survived
    urls = {r["url"] for r in df1.select("url").collect()}
    assert "https://spam.example.net/x" not in urls
    assert "https://docs.example.com/noidx" not in urls

    # determinism: a second run over the same input is value-identical
    out2 = str(tmp_path / "cur2")
    m2 = curate(
        spark, pages, out2, blocked_domains=["spam.example.net"],
        budget=256, max_per_host=200,
    )
    fp2, _ = _fingerprint(spark, out2)
    assert (fp1["h"], fp1["n"]) == (fp2["h"], fp2["n"])
    assert {k: v for k, v in m1.items() if k != "output_path"} == {
        k: v for k, v in m2.items() if k != "output_path"
    }


def _page(url: str, body: str):
    return (
        url,
        (
            "<html><body><div><p>" + body + "</p></div></body></html>"
        ).encode(),
    )


_FILLER = (
    "ordinary prose keeps flowing with plain sentences about weather "
    "markets travel cooking gardens music history science letters numbers "
    "bridges rivers mountains forests harbors stations engines carriages "
    "lanterns windows doors tables chairs shelves papers pencils candles "
    "baskets ribbons buttons fabrics needles threads scissors"
)

_EVAL_PHRASE = (
    "the quick auditing of benchmark leakage requires exactly thirteen "
    "consecutive tokens matched verbatim here"
)

_SPAN = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliett "
    "kilo lima"
)


def test_curate_decontamination_and_span_surgery(spark, tmp_path):
    """Opt-in stages 5a/5b: eval-set 13-gram decontamination drops the
    planted contaminated doc; corpus-wide span surgery removes the planted
    duplicated span from every occurrence but the first."""
    pages = generate_pages(spark, 300, num_partitions=4)
    planted = spark.createDataFrame(
        [
            _page(
                "https://leak.example.org/contaminated",
                _FILLER + " " + _EVAL_PHRASE,
            ),
            _page(
                "https://span-a.example.org/doc",
                "unique opening about riverside architecture " + _SPAN + " "
                + _FILLER,
            ),
            _page(
                "https://span-b.example.org/doc",
                "different preamble concerning mountain railways " + _SPAN
                + " closing remarks about coastal lighthouses "
                + _FILLER,
            ),
        ],
        "url string, html binary",
    ).select(
        "url",
        F.lit(None).cast("timestamp").alias("warc_ts"),
        "html",
        F.lit("").alias("text"),
        F.lit("und").alias("lang"),
    )
    pages = pages.unionByName(planted)
    eval_docs = spark.createDataFrame([(_EVAL_PHRASE,)], "text string")

    out1 = str(tmp_path / "cur1")
    m1 = curate(
        spark, pages, out1, budget=256, max_per_host=200,
        eval_docs=eval_docs, span_surgery=True,
    )
    assert m1["dropped_contaminated"] == 1
    df = spark.read.parquet(out1)
    planted_urls = [
        "https://leak.example.org/contaminated",
        "https://span-a.example.org/doc",
        "https://span-b.example.org/doc",
    ]
    rows = {
        r["url"]: r["text"]
        for r in df.where(F.col("url").isin(planted_urls)).collect()
    }
    assert "https://leak.example.org/contaminated" not in rows
    assert set(rows) == {
        "https://span-a.example.org/doc",
        "https://span-b.example.org/doc",
    }
    # exactly one occurrence of the planted span survives corpus surgery;
    # the repeat keeps its unique surroundings (post-surgery text is the
    # normalized lowercase token stream)
    has_span = {u for u, t in rows.items() if _SPAN in t}
    assert len(has_span) == 1
    loser = (set(rows) - has_span).pop()
    assert _SPAN not in rows[loser]
    if loser.startswith("https://span-a"):
        assert "riverside" in rows[loser]
    else:
        assert "mountain" in rows[loser]

    # determinism: the opt-in stages preserve two-run value identity
    out2 = str(tmp_path / "cur2")
    m2 = curate(
        spark, pages, out2, budget=256, max_per_host=200,
        eval_docs=eval_docs, span_surgery=True,
    )
    fp1, _ = _fingerprint(spark, out1)
    fp2, _ = _fingerprint(spark, out2)
    assert (fp1["h"], fp1["n"]) == (fp2["h"], fp2["n"])
    assert {k: v for k, v in m1.items() if k != "output_path"} == {
        k: v for k, v in m2.items() if k != "output_path"
    }
