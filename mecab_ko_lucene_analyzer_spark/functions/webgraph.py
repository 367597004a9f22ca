"""Web-graph operators over a crawl corpus: link extraction from the
``html:binary`` column, host-level graph aggregation, and PageRank.

Link structure is a first-class curation signal for a training-data
pipeline over web text (centrality-weighted sampling, spam-host
down-weighting — the same role harmonic centrality plays in Common
Crawl's own crawl ranking). Everything here is Spark-first:

* :func:`extract_links` is a pure Catalyst chain (lenient decode →
  ``regexp_extract_all`` on an RE2-compatible href pattern → explode →
  absolutize against the page url) — per-row map work, zero shuffles
  before the explode, so it pipelines into any downstream aggregation.
* :func:`host_graph` is one hash aggregation with map-side combine —
  the shuffle carries one row per (partition, src_host, dst_host).
* :func:`pagerank` is the standard iterative formulation. The edge
  relation is hash-partitioned on ``src`` ONCE and persisted; each
  iteration shuffles only the rank vector (one row per node) into the
  join and one aggregation by ``dst`` — the 100 TB-scale edge table
  never re-shuffles. Ranks checkpoint every ``checkpoint_every``
  rounds when a directory is set (same lineage-growth discipline as
  ``dedup_clusters``).

Oracles: all three have exact DuckDB renderings in ``__spark_entry__``
(the PageRank oracle unrolls the fixed iteration count as chained
CTEs; float noise from summation order is absorbed by the driver's
round-6 compare, the ``unigram_logprob`` precedent).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = [
    "HREF_RE",
    "extract_links",
    "host_graph",
    "pagerank",
]

# quoted href values only (documented bound: unquoted hrefs are <1% of
# the modern web and need an HTML parser to delimit safely). ASCII-only
# and RE2-compatible (no backrefs/lookaround) so the DuckDB oracle
# replays it byte-for-byte. The value excludes quotes/angle
# brackets/whitespace — the capture never crosses an attribute.
HREF_RE = r"""(?i)<a[^>]*href\s*=\s*["']([^"'<> \t\r\n]+)["']"""

# scheme-shaped prefix (mailto:, javascript:, tel:, data: ... or a real
# scheme://) — used to split absolute urls from scheme-less paths
_ABS_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://"
_SCHEME_ONLY_RE = r"^[A-Za-z][A-Za-z0-9+.-]*:"


def extract_links(
    pages: DataFrame,
    url: str = "url",
    html: str = "html",
    out: str = "href",
) -> DataFrame:
    """``(url, href)`` rows: every absolute, protocol-relative, or
    root-relative ``<a href>`` target in the page, absolutized against
    the page url. Documented bounds (each deterministic): unquoted
    hrefs, path-relative hrefs (``a/b.html`` — same-host by
    construction, so host-graph-irrelevant), and non-http(s) schemes
    (``mailto:``, ``javascript:``) are dropped; dot-segments are not
    normalized. NULL html yields no rows.

    Pure per-row map work + one Generate (explode) — zero shuffles, so
    the downstream host aggregation's exchange is the first one.
    """
    u = F.col(url)
    h = F.col(html)
    scheme = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    host = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    # lenient decode: the href pattern is ASCII-only, so the lossless
    # ISO-8859-1 byte view can never mis-match whatever the charset is
    raw = F.explode(
        F.regexp_extract_all(F.decode(h, "ISO-8859-1"), F.lit(HREF_RE), F.lit(1))
    ).alias("_raw_href")
    links = pages.select(u.alias(url), scheme.alias("_scheme"), host.alias("_host"), raw)
    r = F.col("_raw_href")
    resolved = (
        F.when(r.rlike(_ABS_RE), r)
        .when(r.startswith("//"), F.concat(F.col("_scheme"), F.lit(":"), r))
        .when(
            r.startswith("/") & (F.col("_host") != ""),
            F.concat(F.col("_scheme"), F.lit("://"), F.col("_host"), r),
        )
        .otherwise(F.lit(None))
    )
    return (
        links.withColumn(out, resolved)
        # keep http(s) only: a scheme-shaped prefix that is not
        # followed by // is mailto:/javascript:/tel:/data: territory
        .filter(F.col(out).rlike(r"(?i)^https?://"))
        .select(url, out)
    )


def host_graph(
    links: DataFrame,
    url: str = "url",
    href: str = "href",
    keep_self: bool = False,
) -> DataFrame:
    """Host-level edge list ``(src_host, dst_host, n_links)`` from an
    :func:`extract_links` output. Hosts lowercase (ports kept — a
    different port is a different authority). Self-loops dropped by
    default (they dominate raw counts and carry no cross-site signal);
    ``keep_self=True`` keeps them. One hash aggregation, map-side
    combined."""
    host = lambda c: F.lower(  # noqa: E731
        F.regexp_extract(F.col(c), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    edges = links.select(
        host(url).alias("src_host"), host(href).alias("dst_host")
    ).filter((F.col("src_host") != "") & (F.col("dst_host") != ""))
    if not keep_self:
        edges = edges.filter(F.col("src_host") != F.col("dst_host"))
    return edges.groupBy("src_host", "dst_host").agg(
        F.count("*").alias("n_links")
    )


def pagerank(
    edges: DataFrame,
    src: str = "src_host",
    dst: str = "dst_host",
    weight: str | None = None,
    iters: int = 5,
    damping: float = 0.85,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 3,
) -> DataFrame:
    """PageRank over an edge list → ``(node, rank)``.

    Standard power iteration: ``rank' = (1-d)/N + d * Σ_in rank/outdeg``
    (``weight`` switches to weighted out-fractions). Documented bound:
    dangling-node mass is NOT redistributed (their rank contributes to
    nobody; every node still receives the ``(1-d)/N`` teleport floor) —
    the usual simplification when rank is a *relative* quality signal,
    and what keeps the per-iteration plan at exactly two exchanges.

    Scale shape: the out-fraction relation (edges + precomputed
    ``1/outdeg``) is computed ONCE, hash-partitioned on ``src``, and
    persisted — each of the ``iters`` rounds shuffles only the rank
    vector (|nodes| rows) to the join and one hash aggregate on
    ``dst``; the edge table is never re-shuffled. Lineage checkpoints
    every ``checkpoint_every`` rounds (reliable when
    ``checkpoint_dir`` is set, else local truncation via persist) —
    the ``dedup_clusters`` discipline.
    """
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # one partitioning, reused by every iteration's join
    frac = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("frac"))
        .repartition(F.col("src"))
        .persist()
    )
    n_nodes = nodes.count()  # also materializes the node set
    teleport = (1.0 - damping) / n_nodes
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for i in range(iters):
        contrib = (
            frac.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("frac") * F.col("rank")).alias("in_rank"))
        )
        ranks = (
            nodes.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce(F.col("in_rank"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = (
                ranks.checkpoint(eager=True)
                if checkpoint_dir is not None
                else ranks.persist()
            )
    return ranks
