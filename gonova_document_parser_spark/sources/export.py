"""Output-format export switch (SURVEY §2.1 A3, K3).

Grafts the reference's markdown/json/html export branch
(``deepseek_processor.py:159-168``, ``api.py:236-253``, ``cli.py:149-163``)
into column-level serializers + one writer: the payload column is built
JVM-side (``to_json``/``concat``), then written with the format-appropriate
sink.  One row per document; "json" carries the full nodes/edges graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.graph import edges_expr, nodes_expr

FORMATS = ("markdown", "json", "html")


def render_expr(fmt: str):
    if fmt == "markdown":
        return F.col("extracted_text")
    if fmt == "json":
        return F.to_json(
            F.struct(
                F.col("url"),
                F.col("page_type"),
                nodes_expr("extracted_text").alias("nodes"),
                edges_expr("extracted_text").alias("edges"),
                F.col("success"),
            )
        )
    if fmt == "html":
        return F.concat(
            F.lit("<!DOCTYPE html><html><body><pre>"),
            F.replace(
                F.replace(F.col("extracted_text"), F.lit("&"), F.lit("&amp;")),
                F.lit("<"),
                F.lit("&lt;"),
            ),
            F.lit("</pre></body></html>"),
        )
    raise ValueError(f"unknown format {fmt!r}; one of {FORMATS}")


def export_extracted(extracted: DataFrame, path: str, fmt: str = "markdown") -> None:
    """Write one payload per document: (url, payload) parquet for random
    access, or use .write.text on payload alone for raw file dumps."""
    out = extracted.select("url", render_expr(fmt).alias("payload"))
    out.write.mode("overwrite").parquet(f"{path}/fmt={fmt}")
