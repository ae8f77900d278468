"""PII detection and scrubbing — webtext curation staples, pure column exprs.

Training-data pipelines redact contact information before anything else
sees the text.  Everything here is built-in ``regexp_count`` /
``regexp_replace`` (JVM-side, whole-stage codegen); the patterns are
deliberately RE2-compatible (no backrefs/lookaround) so the DuckDB oracle
runs the byte-identical regexes.

Scrub order is part of the spec: emails first (their local part can look
like a phone), then IPv4 (their digits can look like a phone), then
phones.  Placeholders are the common corpus-sanitization tokens.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
# 8+ digit runs with common separators, optional leading +
PHONE_RE = r"\+?\d[\d\s().-]{6,}\d"

EMAIL_TOKEN = "[EMAIL]"
IP_TOKEN = "[IP]"
PHONE_TOKEN = "[PHONE]"


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_counts(col="text") -> dict[str, Column]:
    """Per-row PII hit counts (pre-scrub, on the raw text)."""
    c = _c(col)
    return {
        "n_emails": F.regexp_count(c, F.lit(EMAIL_RE)),
        "n_ips": F.regexp_count(c, F.lit(IPV4_RE)),
        "n_phones": F.regexp_count(c, F.lit(PHONE_RE)),
    }


def scrub_pii_expr(col="text") -> Column:
    """Redact emails -> IPv4s -> phones (order is the pinned spec)."""
    c = _c(col)
    c = F.regexp_replace(c, EMAIL_RE, EMAIL_TOKEN)
    c = F.regexp_replace(c, IPV4_RE, IP_TOKEN)
    c = F.regexp_replace(c, PHONE_RE, PHONE_TOKEN)
    return c


def repetition_ratio_expr(col="text") -> Column:
    """Within-document token-repetition ratio (Gopher-style quality signal):
    1 - distinct_tokens/tokens; 0 for empty docs."""
    from .textstats import tokens_expr

    toks = tokens_expr(col)
    n = F.size(toks)
    return F.when(
        n > 0, F.round(1.0 - F.size(F.array_distinct(toks)) / n, 6)
    ).otherwise(F.lit(0.0))
