"""Host-level link graph + fixed-iteration PageRank (r7) — the
domain-authority signal crawl curation actually uses: Common-Crawl
publishes host/domain-level rank tables, and published pipelines gate
or weight documents by the rank of their host. Everything here is
pages-table-native: extract hrefs from the html payload (pure
Catalyst regex), collapse to distinct host→host edges, then a
FIXED-ITERATION damped PageRank as a join/agg loop — the textbook
Spark formulation, with an exact DuckDB twin built from the same
number of unrolled CTEs.

Scale notes (100 TB pages, host-level graph):
  * edge extraction is a narrow regexp_extract_all + explode over the
    pages scan; the distinct() is the one corpus-sized shuffle and
    collapses the graph to HOST cardinality (millions of rows, not
    10^12) — every later stage works on host-sized tables;
  * each iteration is one join (edges ⨝ ranks on src) + one keyed agg
    (sum by dst) — two host-sized shuffles; iterations are bounded by
    the caller (rank tables converge in a handful for gating
    purposes, and the twin must unroll them, which keeps the contract
    honest);
  * dangling hosts (no out-links) keep receiving the teleport term
    but their mass is NOT redistributed — the standard simplification
    (ranks no longer sum to exactly 1); the twin mirrors it, and the
    docstring states it so the contract is the implemented one.

Float parity with DuckDB: operators/lm.py discipline — integer
literals only (damping passed as num/den), CAST AS DOUBLE at the same
tree positions, consumers publish ROUND(rank * 1e9) so per-dst
summation-order ulps can't break hash equality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import url_host_col

__all__ = ["links_col", "host_edges", "pagerank_hosts",
           "pagerank_sql_duckdb", "HREF_RE", "noindex_col",
           "NOINDEX_RE"]

# href values in anchor tags; [^"'#] skips same-page fragment links.
# Shared Java/RE2 dialect ((?i) inline flag, lazy [^>]*).
HREF_RE = r"""(?i)<a[^>]*\shref\s*=\s*["']([^"'#][^"']*)["']"""

_ABS_RE = r"(?i)^https?://"


def links_col(html_col="html") -> Column:
    """html → array of raw href strings (anchors only; fragment-only
    links dropped at the regex). Binary html casts to string."""
    col = html_col if not isinstance(html_col, str) else F.col(html_col)
    # regexp_extract_all's pattern arg is ColumnOrName: a bare string
    # would resolve as a column reference
    return F.regexp_extract_all(col.cast("string"), F.lit(HREF_RE), 1)


def host_edges(pages: DataFrame, url_col: str = "url",
               html_col: str = "html") -> DataFrame:
    """pages → distinct (src, dst) lowercase host pairs. Absolute
    http(s) links only (relative links resolve to the same host =
    self-loop = dropped anyway); empty hosts and self-loops dropped.
    The distinct() is the single corpus-sized shuffle."""
    links = pages.select(
        F.lower(url_host_col(url_col)).alias("src"),
        F.explode(links_col(html_col)).alias("link"),
    ).filter(F.col("link").rlike(_ABS_RE))
    with_dst = links.select(
        "src", F.lower(url_host_col("link")).alias("dst")
    )
    return (
        with_dst.filter(
            (F.col("src") != "") & (F.col("dst") != "")
            & (F.col("src") != F.col("dst"))
        ).distinct()
    )


def pagerank_hosts(edges: DataFrame, iters: int = 3,
                   damping_num: int = 85,
                   damping_den: int = 100,
                   checkpoint_every: int | None = None) -> DataFrame:
    """(src, dst) edges → (node, rank) after `iters` damped
    iterations from the uniform start. rank_{i+1}(v) = (1-d)/N +
    d * Σ_{u→v} rank_i(u)/outdeg(u); dangling mass not redistributed
    (see module docstring). d = damping_num/damping_den as integers
    for twin float parity.

    ``checkpoint_every`` (r8, VERDICT r7 item 5): every K iterations
    the rank table is localCheckpoint-ed (eager), truncating the
    join/agg lineage that otherwise stacks one level per iteration —
    required for 20+ iteration production runs (plan-tree and
    re-optimization cost grow with depth). The persisted edge table is
    unpersisted once the final ranks are materialized. Values are
    unchanged (checkpointing only cuts lineage); default None keeps
    the fully-lazy 3-iteration shape the driver row hash-gates."""
    dbl = "double"
    # the edge table is read by every iteration (plus nodes/outdeg):
    # persist so the upstream extraction runs once, not iters+2 times
    edges = edges.persist()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n1 = nodes.agg(F.count(F.lit(1)).alias("n"))  # 1 row, stays lazy
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    d = F.lit(damping_num).cast(dbl) / F.lit(damping_den).cast(dbl)
    base = (
        F.lit(damping_den - damping_num).cast(dbl)
        / F.lit(damping_den).cast(dbl)
        / F.col("n").cast(dbl)
    )
    ranks = nodes.crossJoin(F.broadcast(n1)).select(
        "node",
        (F.lit(1).cast(dbl) / F.col("n").cast(dbl)).alias("rank"),
    )
    for i in range(iters):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(outdeg, "src")
            .groupBy("dst")
            .agg(
                F.sum(F.col("rank") / F.col("deg").cast(dbl)).alias("contrib")
            )
        )
        ranks = (
            nodes.crossJoin(F.broadcast(n1))
            .join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    base
                    + d * F.coalesce("contrib", F.lit(0).cast(dbl))
                ).alias("rank"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    if checkpoint_every:
        # materialize, then release the pinned edge blocks — the
        # returned DataFrame no longer depends on them
        ranks = ranks.localCheckpoint(eager=True)
        edges.unpersist()
    return ranks


def pagerank_sql_duckdb(edges_rel: str, iters: int = 3,
                        damping_num: int = 85,
                        damping_den: int = 100) -> str:
    """Exact DuckDB twin: the same number of unrolled iteration CTEs
    with the identical IEEE expression trees. SELECT node, rank."""
    base = (
        f"CAST({damping_den - damping_num} AS DOUBLE) "
        f"/ CAST({damping_den} AS DOUBLE) / CAST(n AS DOUBLE)"
    )
    d = (
        f"CAST({damping_num} AS DOUBLE) / CAST({damping_den} AS DOUBLE)"
    )
    parts = [
        f"nodes AS (SELECT src AS node FROM {edges_rel} "
        f"UNION SELECT dst FROM {edges_rel})",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)",
        f"outdeg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg "
        f"FROM {edges_rel} GROUP BY src)",
        "r0 AS (SELECT node, CAST(1 AS DOUBLE) / CAST(n AS DOUBLE) "
        "AS rank FROM nodes, nn)",
    ]
    for i in range(iters):
        parts.append(
            f"c{i} AS (SELECT e.dst AS node, "
            f"SUM(r{i}.rank / CAST(outdeg.deg AS DOUBLE)) AS contrib "
            f"FROM {edges_rel} e "
            f"JOIN r{i} ON e.src = r{i}.node "
            f"JOIN outdeg ON e.src = outdeg.src GROUP BY e.dst)"
        )
        parts.append(
            f"r{i + 1} AS (SELECT nodes.node, "
            f"{base} + {d} * COALESCE(c{i}.contrib, CAST(0 AS DOUBLE)) "
            f"AS rank FROM nodes CROSS JOIN nn "
            f"LEFT JOIN c{i} ON nodes.node = c{i}.node)"
        )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT node, rank FROM r{iters}"
    )


# both attribute orders, spelled as an alternation because RE2 (the
# DuckDB twin's engine) has no lookaheads
NOINDEX_RE = (
    r"""(?is)<meta[^>]*\sname\s*=\s*["']?robots\b[^>]*"""
    r"""\scontent\s*=\s*["']?[^"'>]*noindex"""
    r"""|<meta[^>]*\scontent\s*=\s*["']?[^"'>]*noindex[^>]*"""
    r"""\sname\s*=\s*["']?robots\b"""
)


def noindex_col(html_col="html") -> Column:
    """True when the page opts out of indexing via
    <meta name="robots" content="... noindex ...">, the crawl-polite
    pre-filter a curation pipeline applies before keeping a page.
    Pure Catalyst rlike; binary html casts to string. The DuckDB twin
    is `regexp_matches(html, NOINDEX_RE)` — same RE2-safe pattern."""
    col = html_col if not isinstance(html_col, str) else F.col(html_col)
    return col.cast("string").rlike(NOINDEX_RE)
