"""Per-line boilerplate stripping: planted furniture on hand-built docs."""

import pyspark.sql.functions as F

from gonova_document_parser_spark.functions.boilerplate import (
    line_verdict_expr,
    strip_boilerplate,
)

PROSE = "The quick brown fox jumps over the lazy dog in the garden today."
LONG_LISTY = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
)  # 12 words, no stopwords -> kept by the long-line arm


def _doc(*lines):
    return "\n".join(lines)


def test_planted_furniture_dropped(spark):
    text = _doc(
        "Home | About | Contact",
        "We use cookies to improve your browsing experience on this site.",
        PROSE,
        "SUBSCRIBE NOW TO OUR NEWSLETTER TODAY",
        "Short line.",
        "© 2026 Example Corp. All rights reserved.",
        LONG_LISTY,
    )
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    row = strip_boilerplate(df).collect()[0]
    assert row["n_lines"] == 7
    assert row["n_kept"] == 2
    assert row["clean_text"] == PROSE + "\n" + LONG_LISTY


def test_word_boundary_markers(spark):
    # "blog in progress" must NOT trip the "log in" marker
    ok = "The blog in progress describes the new parser design in detail."
    bad = "Please log in to continue reading the article on this site."
    df = spark.createDataFrame(
        [(l,) for l in (ok, bad)], "line string"
    ).select("line", line_verdict_expr(F.col("line")).alias("v"))
    got = {r["line"]: r["v"] for r in df.collect()}
    assert got[ok] is True
    assert got[bad] is False


def test_upper_ratio_gate(spark):
    shout = "THIS IS THE IMPORTANT ANNOUNCEMENT SECTION OF THE SITE HEADER AREA"
    df = spark.createDataFrame([(shout,)], "line string")
    assert df.select(line_verdict_expr(F.col("line")).alias("v")).collect()[0][
        "v"
    ] is False


def test_empty_and_whitespace_text(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   \n  \n ")], "doc_id int, text string"
    )
    rows = {r["doc_id"]: r for r in strip_boilerplate(df).collect()}
    assert rows[1]["n_kept"] == 0 and rows[1]["clean_text"] == ""
    assert rows[2]["n_kept"] == 0 and rows[2]["clean_text"] == ""


def test_zero_shuffle_plan(spark):
    """The operator is a pure projection — no Exchange in the plan."""
    df = spark.createDataFrame([(1, PROSE)], "doc_id int, text string")
    plan = (
        strip_boilerplate(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
