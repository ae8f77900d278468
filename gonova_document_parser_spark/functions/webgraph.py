"""Web-graph construction and centrality over crawled pages.

``outlink_host_graph`` turns raw page HTML into the host-level link graph
(the backbone of crawl frontier scheduling, spam/host-authority scoring,
and domain-weighted sampling); ``pagerank_hosts`` runs a fixed-iteration
power-iteration PageRank over it.

PageRank here is **integer-exact**: ranks are scaled integers and every
contribution is ``(r * damping_pct * w) div (100 * W)`` in int64 — no
floating-point addition anywhere, so the result is independent of
aggregation order and bit-identical between Spark and the DuckDB oracle
(float PageRank sums in different orders per engine/partitioning and can
flip a rounded digit).  Fixed ``iters`` instead of an epsilon test keeps
the computation SQL-unrollable; 5 iterations is plenty for host-level
ranking (per-iteration contraction 0.85).

Overflow bound: max intermediate is r * damping_pct * w; with the default
SCALE=1e6, r is bounded by total injected mass (< n_hosts * SCALE), so
int64 holds up to ~10^5 hosts with weights ~10^3 — raise awareness, not
SCALE, beyond that (or shard the graph).  Dangling hosts (no outlinks)
keep their base rank and their mass is dropped, not redistributed — the
documented simplification; the oracle replicates it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..plans.partitioning import EXPR_FANOUT_MIN_BYTES, fan_out

_HREF_RE = r"""href\s*=\s*["']([^"']+)["']"""
_SCALE = 1_000_000


def host_of_url_expr(col) -> "F.Column":
    """Host of an absolute or protocol-relative url (lowercased, no port)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_extract(c, r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*:)?//([^/:?#]+)", 1))


def outlink_host_graph(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html_text",
) -> DataFrame:
    """(src_host, dst_host, n_links) from page HTML.

    hrefs come from one ``regexp_extract_all`` over the page string (both
    quote styles); absolute and protocol-relative targets resolve to their
    own host, everything else (relative paths, fragments) to the page's
    host.  One explode + one groupBy — the aggregation keys are two host
    strings, so the shuffle carries edges, not pages.
    """
    src = host_of_url_expr(url_col)
    pages = fan_out(
        df.select(F.col(url_col), F.col(html_col)),
        min_bytes=EXPR_FANOUT_MIN_BYTES,
    ).select(
        src.alias("src_host"),
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(_HREF_RE), F.lit(1))
        ).alias("href"),
    )
    dst_abs = host_of_url_expr(F.col("href"))
    return (
        pages.select(
            "src_host",
            F.when(dst_abs != "", dst_abs).otherwise(F.col("src_host")).alias(
                "dst_host"
            ),
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


def pagerank_hosts(
    edges: DataFrame,
    src: str = "src_host",
    dst: str = "dst_host",
    weight: str = "n_links",
    iters: int = 5,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-iteration integer PageRank -> (host, rank_scaled).

    r_0(v) = SCALE; r_{t+1}(v) = BASE + sum over in-edges (u,v) of
    (r_t(u) * damping_pct * w(u,v)) div (100 * W(u)), all int64, where
    W(u) is u's total out-weight and BASE = (100-damping_pct)% of SCALE.
    """
    base = (100 - damping_pct) * _SCALE // 100
    # ONE materialization of the edge list: nodes and the weighted edge
    # table previously each pulled the full upstream lineage (for
    # host_pagerank that lineage is the page render + href regex over the
    # whole corpus — two redundant passes, round 6).  Everything below
    # derives from this checkpoint; recomputed per invocation.
    ed = edges.select(
        F.col(src).alias("e_src"), F.col(dst).alias("e_dst"), F.col(weight).alias("w")
    ).localCheckpoint(eager=False)
    nodes = (
        ed.select(F.col("e_src").alias("host"))
        .union(ed.select(F.col("e_dst").alias("host")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    outw = ed.groupBy("e_src").agg(F.sum("w").alias("wsum"))
    e = ed.join(outw, "e_src").localCheckpoint(eager=False)
    ranks = nodes.select("host", F.lit(_SCALE).cast("bigint").alias("r"))
    for _ in range(iters):
        contrib = (
            e.join(ranks, e["e_src"] == ranks["host"])
            .select(
                F.col("e_dst"),
                F.expr(f"(r * {damping_pct} * w) div (100 * wsum)").alias("c"),
            )
            .groupBy("e_dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes["host"] == contrib["e_dst"], "left")
            .select(
                "host",
                (F.lit(base) + F.coalesce("s", F.lit(0))).cast("bigint").alias("r"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("host", F.col("r").alias("rank_scaled"))


def anchor_text_agg(
    links: DataFrame,
    target_col: str = "target",
    anchor_col: str = "anchor",
) -> DataFrame:
    """Anchor-text aggregation: what the web CALLS each target page.

    Inbound anchor strings are a classic relevance/label signal (they
    describe the target in other authors' words — the web-scale
    counterpart of human labels).  Output per target:
    ``(target, n_links, n_anchors, top_anchor, top_anchor_links)`` where
    ``top_anchor`` is the most frequent non-empty anchor string with a
    deterministic lexicographic-max tiebreak.

    Two hash aggregations, no window and no join: groupBy (target,
    anchor) for per-string counts (map-side combine collapses the hot
    anchors early), then groupBy target with a conditional struct-max —
    the same shape the skew-tested salted_counts family uses, so a
    mega-inlinked target (every wiki page links "home") costs one
    combiner-friendly reduce, not a sorted window.
    """
    t = F.col(target_col).alias("target")
    a = F.col(anchor_col).alias("anchor")
    per_anchor = links.select(t, a).groupBy("target", "anchor").agg(
        F.count(F.lit(1)).alias("c")
    )
    best = F.max(
        F.when(
            F.col("anchor") != "",
            F.struct(F.col("c").alias("c"), F.col("anchor").alias("anchor")),
        )
    ).alias("_best")
    return (
        per_anchor.groupBy("target")
        .agg(
            F.sum("c").alias("n_links"),
            F.count(F.lit(1)).alias("n_anchors"),
            best,
        )
        .select(
            "target",
            "n_links",
            "n_anchors",
            F.col("_best.anchor").alias("top_anchor"),
            F.col("_best.c").alias("top_anchor_links"),
        )
    )
