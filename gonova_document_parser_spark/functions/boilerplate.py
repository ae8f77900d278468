"""Per-line boilerplate stripping — the extraction tier's last cleanup.

HTML extraction leaves navigation crumbs, cookie banners, copyright
footers, and SHOUTING section headers interleaved with the prose the
training pipeline actually wants.  The classic cure is a per-line (or
per-block) classifier in the jusText / boilerpipe family (Kohlschütter
et al., WSDM 2010; Pomikálek 2011): short link-dense lines with no
function words are furniture, long stopword-bearing lines are content.

This is the deterministic, engine-exact subset of that idea: every
feature is computable by the SAME regex/arithmetic in Spark and DuckDB,
so the verdict per line (and therefore the reassembled clean text) is
byte-reproducible cross-engine.  The whole operator is pure Column
expressions over ``split(text, '\\n')`` — transform/filter/array_join
lambdas, whole-stage codegen, ZERO shuffles and no Python in the hot
path; at 100 TB it rides the same narrow scan as every other per-doc
stage.

A line is kept as CONTENT iff ALL of:
- at least ``min_chars`` characters and ``min_words`` word tokens
  (jusText's length gate),
- no boilerplate marker phrase (cookie/subscribe/copyright/nav
  symbols — the high-precision blacklist),
- uppercase ratio over letters <= ``max_upper`` (headers/nav shout),
- a stopword hit OR >= ``long_words`` words (jusText's low/high
  stopword-density split, collapsed to its deterministic core: short
  lines must carry at least one function word to count as prose).

Reference behavior grafted: the reference keeps whatever its OCR/text
layer emits per page (``mineru_processor.py`` page text passthrough);
line-level cleanup is the corpus-scale extension its downstream
consumers run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .textstats import STOPWORDS

# word tokens for line features: lowercase alnum runs (shared literally
# with the DuckDB oracle — keep in sync with oracle_sql()['boilerplate'])
WORD_RE = "[a-z0-9]+"

# high-precision furniture markers; one RE2 alternation, case-insensitive
# via lower() on the input (DuckDB regexp_matches has no inline flags in
# the subset we pin, so the casefold lives outside the pattern)
MARKER_RE = (
    "cookie|subscribe|\\bsign in\\b|\\blog in\\b|all rights reserved"
    "|privacy policy|terms of service|click here|share this|©|»|\\|"
)


def line_verdict_expr(
    line: Column,
    min_chars: int = 30,
    min_words: int = 4,
    max_upper: float = 0.5,
    long_words: int = 12,
) -> Column:
    """True iff one line reads as content under the deterministic rule."""
    t = F.trim(line)
    low = F.lower(t)
    words = F.regexp_extract_all(low, F.lit(WORD_RE), 0)
    n_words = F.size(words)
    n_upper = F.regexp_count(t, F.lit("[A-Z]"))
    n_alpha = F.regexp_count(t, F.lit("[A-Za-z]"))
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    has_stop = F.exists(words, lambda w: F.array_contains(sw, w))
    return (
        (F.length(t) >= min_chars)
        & (n_words >= min_words)
        & ~low.rlike(MARKER_RE)
        & ((n_alpha == 0) | (n_upper <= F.lit(max_upper) * n_alpha))
        & (has_stop | (n_words >= long_words))
    )


def strip_boilerplate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 30,
    min_words: int = 4,
    max_upper: float = 0.5,
    long_words: int = 12,
) -> DataFrame:
    """(id, n_lines, n_kept, clean_text) — furniture lines dropped,
    surviving lines rejoined with '\\n' in original order.

    One transform/filter/array_join chain per row; the verdict lambda is
    shared with :func:`line_verdict_expr` so a caller can audit
    line-by-line with the identical rule.
    """
    lines = F.split(F.col(text_col), "\n")
    keep = lines  # alias for readability; filtered below
    verdict = lambda l: line_verdict_expr(  # noqa: E731 — shared lambda
        l, min_chars, min_words, max_upper, long_words
    )
    kept = F.filter(keep, verdict)
    return df.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        F.array_join(kept, "\n").alias("clean_text"),
    )
