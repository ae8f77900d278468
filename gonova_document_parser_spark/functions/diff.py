"""Corpus snapshot diff — the ops tool behind incremental crawl audits.

``crawl_diff(old, new)`` classifies every url across two corpus
snapshots as added / removed / changed / unchanged, with content
fingerprints on both sides.  This is what an operator runs after
``run_incremental`` to answer "what did this crawl append actually
change?" and what a data-lineage audit stores per snapshot pair.

Scale shape: ONE full-outer equi-join on url over two narrow
(url, 16-byte md5) projections — the text column never shuffles; the
fingerprint is computed map-side next to the scan, so each side
contributes ~48 bytes/row to the join regardless of document size.
Status is a pure expression over fingerprint nullability/equality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _norm(col: str | Column) -> Column:
    """Collapse-THEN-trim normalization: ``trim`` strips only 0x20
    spaces, so the canonical ``normalized_text_expr`` (trim-first) keeps
    a trailing space when the refetch ends in a newline/tab — collapsing
    first turns all edge whitespace into spaces that trim then removes.
    Diff wants that stronger invariance; the dedup key stays on the
    pinned canonical form."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def crawl_diff(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """(url, status, old_fp, new_fp) across two snapshots.

    status: 'added' (url only in new), 'removed' (only in old),
    'changed' (both, different normalized-content md5), 'unchanged'.
    Fingerprints are md5 hex of normalized text (lowercase, collapsed
    whitespace — the same canonical dedup key every other operator
    uses), so a reformatting-only refetch reads as unchanged.

    Presence is tracked by explicit side markers, NOT fingerprint
    nullability: a row with NULL text has a NULL fingerprint but is
    still PRESENT in its snapshot (two NULL-text fetches of one url
    compare unchanged via null-safe equality).  Precondition: url is
    unique per snapshot — the canonical corpus key after
    ``latest_snapshot``/``url_canonical_dedup``; duplicate urls would
    fan the full-outer join out into contradictory status rows.
    """
    o = old.select(
        F.col(url_col).alias("url"),
        F.md5(_norm(text_col)).alias("old_fp"),
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        F.col(url_col).alias("url"),
        F.md5(_norm(text_col)).alias("new_fp"),
        F.lit(True).alias("_in_new"),
    )
    joined = o.join(n, "url", "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.col("old_fp").eqNullSafe(F.col("new_fp")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select("url", status.alias("status"), "old_fp", "new_fp")
