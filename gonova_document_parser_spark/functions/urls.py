"""URL canonicalization — the crawl-dedup normalization pass.

A crawl sees the same page under many spellings: scheme/host case, www.
prefixes, default ports, tracking parameters (utm_*, fbclid, gclid),
fragments, trailing separators.  Canonicalizing BEFORE url-keyed dedup or
checkpoint partitioning collapses these families; everything here is a
chain of built-in ``regexp_replace`` steps (JVM-side, whole-stage codegen)
with RE2-compatible patterns, so the DuckDB oracle runs byte-identical
regexes.  The step order is part of the spec: fragment first (so params
hiding behind '#' aren't stripped), then tracking params, then separator
cleanup, then scheme/host normalization.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_TRACKING = r"(utm_[a-z]+|fbclid|gclid|msclkid|mc_eid)"


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def canonical_url_expr(col="url") -> Column:
    """Deterministic canonical form of an http(s) URL (pinned spec):

    1. drop the fragment (``#...``)
    2. drop tracking query params (utm_*, fbclid, gclid, msclkid, mc_eid)
    3. repair separators (the first orphaned ``&`` becomes ``?``;
       ``?&`` collapses; trailing ``?``/``&`` dropped)
    4. lowercase the scheme+host part (path/query case preserved)
    5. drop a ``www.`` host prefix and default ``:80``/``:443`` ports
    """
    c = _c(col)
    c = F.regexp_replace(c, r"#.*$", "")
    c = F.regexp_replace(c, r"[?&]" + _TRACKING + r"=[^&#]*", "")
    # if the '?' was consumed with a leading tracking param, promote the
    # first remaining '&' (no '?' before it) back to '?'
    c = F.regexp_replace(c, r"^([^?]*?)&", "$1?")
    c = F.regexp_replace(c, r"\?&", "?")
    c = F.regexp_replace(c, r"[?&]$", "")
    # lowercase ONLY the scheme://host prefix (path/query case is meaningful);
    # the pattern is ^-anchored so replace-all and replace-first coincide
    head_re = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)"
    head = F.regexp_extract(c, head_re, 1)
    rest = F.regexp_replace(c, head_re, "")
    c = F.when(head != "", F.concat(F.lower(head), rest)).otherwise(c)
    c = F.regexp_replace(c, r"^(https?://)www\.", r"$1")
    # default-port strip is scheme-matched: :80 is only the default for
    # http and :443 only for https — http://host:443/x is NOT http://host/x
    c = F.regexp_replace(c, r"^(http://[^/:]+):80(/|$)", r"$1$2")
    c = F.regexp_replace(c, r"^(https://[^/:]+):443(/|$)", r"$1$2")
    return c
