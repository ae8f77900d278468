"""Crawl-governance filters: robots noindex + domain blocklists.

A web-scale training corpus must drop (a) pages whose authors opted out
of indexing (``<meta name="robots" content="noindex">`` — the in-page
counterpart of robots.txt, the only opt-out signal present in an
archived page body) and (b) pages from blocklisted domains including
ALL their subdomains (spam/adult/PII blocklists are domain-suffix
lists).  Both are pure column expressions — whole-stage codegen, no
UDF, filters push toward the scan.

The reference has no crawl-governance surface (it ingests user-uploaded
documents); this is part of the beyond-the-reference training-pipeline
tier (SURVEY "training-data pipeline" rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# one <meta ...> tag carrying BOTH name=robots and a noindex token in
# content, either attribute order, both quote styles, case-insensitive.
# RE2-safe (no backrefs/lookaround) so DuckDB reproduces it verbatim.
# Token anchoring matters: the name value terminates at a quote/space/
# slash so name="robots-extra" can NOT match, and noindex must start
# the content value or follow a space/comma AND be followed by a
# space/comma/closing-quote — content="nonoindexable" and
# content="noindex-when-stale" are NOT opt-outs.  The name terminator
# deliberately excludes ">" in the name-first form (consuming the tag
# end would let [^>]* leak into the NEXT tag); the content-first form
# needs ">" there because name=robots may legitimately end the tag.
_NOINDEX_NAME_FIRST = (
    r"""(?i)<meta\b[^>]*\bname\s*=\s*["']?robots["'\s/]"""
    r"""[^>]*\bcontent\s*=\s*["'](?:[^"']*[\s,])?noindex[\s,"']"""
)
_NOINDEX_CONTENT_FIRST = (
    r"""(?i)<meta\b[^>]*\bcontent\s*=\s*["'](?:[^"']*[\s,])?noindex[\s,"']"""
    r"""[^>]*\bname\s*=\s*["']?robots["'\s/>]"""
)


def robots_noindex_expr(html_col: str | Column = "html_text") -> Column:
    """True iff the page declares ``<meta name="robots" ... noindex>``."""
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    return (F.regexp_count(c, F.lit(_NOINDEX_NAME_FIRST)) > 0) | (
        F.regexp_count(c, F.lit(_NOINDEX_CONTENT_FIRST)) > 0
    )


def host_suffixes_expr(host_col: str | Column) -> Column:
    """All dot-suffixes of a host: a.b.example.com -> [a.b.example.com,
    b.example.com, example.com, com] — the candidate set for domain-
    suffix blocklist matching, built with array ops (no explode)."""
    c = F.col(host_col) if isinstance(host_col, str) else host_col
    parts = F.split(F.lower(c), r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(F.slice(parts, i + 1, n - i), "."),
    )


def domain_blocked_expr(
    blocked_domains: list[str], url_col: str | Column = "url"
) -> Column:
    """True iff the url's host is a blocked domain or any subdomain of one.

    The blocklist ships as a literal array (domain blocklists are
    thousands of entries — broadcast-trivial; for multi-million-entry
    lists join ``host_suffixes_expr`` against a broadcast DataFrame
    instead).  Matching is suffix-at-label-boundary: ``spam.example.net``
    blocks ``x.spam.example.net`` but never ``notspam.example.net``.
    """
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    host = F.lower(F.parse_url(c, F.lit("HOST")))
    blocked = F.array(*[F.lit(d.lower()) for d in blocked_domains])
    return F.arrays_overlap(host_suffixes_expr(host), blocked)


def governance_flags(
    df: DataFrame,
    blocked_domains: list[str],
    url_col: str = "url",
    html_col: str = "html_text",
) -> DataFrame:
    """Per-page governance verdict: (..., noindex, domain_blocked, keep)."""
    return df.select(
        "*",
        robots_noindex_expr(html_col).alias("noindex"),
        domain_blocked_expr(blocked_domains, url_col).alias("domain_blocked"),
    ).withColumn(
        "keep", ~(F.col("noindex") | F.col("domain_blocked"))
    )
