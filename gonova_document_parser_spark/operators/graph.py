"""Graph-structure assembly (SURVEY §2.1 A2) — pure column expressions.

Grafts ``hybrid_processor.py:189-226`` (``_create_graph_structure``): split
the merged output on the page separator, one ``page`` node per part
(``id=page_{i}``, 0-indexed id, 1-indexed ``page``, content INCLUDING the
page marker — the reference keeps it), plus sequential ``follows`` edges.
Entirely JVM-side: split/transform/sequence, no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..spec import PAGE_SEPARATOR

NODE_TYPE = "struct<id:string,type:string,content:string,page:int,level:int>"
EDGE_TYPE = "struct<source:string,target:string,type:string>"


def nodes_expr(text_col: str | Column = "extracted_text") -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    parts = F.split(c, PAGE_SEPARATOR, -1)
    return F.transform(
        parts,
        lambda content, i: F.struct(
            F.concat(F.lit("page_"), i.cast("string")).alias("id"),
            F.lit("page").alias("type"),
            content.alias("content"),
            (i + 1).cast("int").alias("page"),
            F.lit(0).alias("level"),
        ),
    )


def edges_expr(text_col: str | Column = "extracted_text") -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    n_pages = F.size(F.split(c, PAGE_SEPARATOR, -1))
    return F.when(
        n_pages > 1,
        F.transform(
            F.sequence(F.lit(0), n_pages - 2),
            lambda i: F.struct(
                F.concat(F.lit("page_"), i.cast("string")).alias("source"),
                F.concat(F.lit("page_"), (i + 1).cast("string")).alias("target"),
                F.lit("follows").alias("type"),
            ),
        ),
    ).otherwise(F.array().cast(f"array<{EDGE_TYPE}>"))


def graph_structure(extracted: DataFrame, text_col: str = "extracted_text") -> DataFrame:
    """extracted -> (url, nodes ARRAY<STRUCT>, edges ARRAY<STRUCT>, n_pages)."""
    return extracted.select(
        "url",
        nodes_expr(text_col).alias("nodes"),
        edges_expr(text_col).alias("edges"),
        F.size(F.split(F.col(text_col), PAGE_SEPARATOR, -1)).alias("n_pages"),
    )
