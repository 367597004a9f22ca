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
    "ANCHOR_RE",
    "HREF_RE",
    "doc_boost_table",
    "extract_anchor_texts",
    "extract_links",
    "host_graph",
    "incoming_anchors",
    "pagerank",
]

# quoted href values only (documented bound: unquoted hrefs are <1% of
# the modern web and need an HTML parser to delimit safely). ASCII-only
# and RE2-compatible (no backrefs/lookaround) so the DuckDB oracle
# replays it byte-for-byte. The value excludes quotes/angle
# brackets/whitespace — the capture never crosses an attribute.
HREF_RE = r"""(?i)<a[^>]*href\s*=\s*["']([^"'<> \t\r\n]+)["']"""

# HREF_RE extended through the end of the opening tag and into the
# anchor's DIRECT text: group 1 = href value, group 2 = the text up to
# the first '<' (documented bound: markup-nested anchor text, e.g.
# <a..><b>x</b></a>, yields an empty capture and the row is dropped —
# delimiting nested inline markup safely needs an HTML parser). The
# pattern itself stays ASCII-only/RE2-compatible; the capture is
# arbitrary page text, which is why extraction runs on the lenient
# UTF-8 view rather than the byte view.
ANCHOR_RE = HREF_RE + r"[^>]*>([^<]*)"

# scheme-shaped prefix (mailto:, javascript:, tel:, data: ... or a real
# scheme://) — used to split absolute urls from scheme-less paths
_ABS_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://"
_SCHEME_ONLY_RE = r"^[A-Za-z][A-Za-z0-9+.-]*:"

_SCHEME_CAP_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_CAP_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"


def _resolve_href(raw: Column, scheme: Column, host: Column) -> Column:
    """Absolutize a raw href capture against the page's scheme/host:
    absolute urls pass through, ``//host/...`` takes the page scheme,
    ``/path`` takes scheme+host; everything else (path-relative,
    mailto:/javascript:/tel:/data:) resolves to NULL. Shared by
    :func:`extract_links` and :func:`extract_anchor_texts` so the edge
    source and the anchor-text source cannot drift."""
    return (
        F.when(raw.rlike(_ABS_RE), raw)
        .when(raw.startswith("//"), F.concat(scheme, F.lit(":"), raw))
        .when(
            raw.startswith("/") & (host != ""),
            F.concat(scheme, F.lit("://"), host, raw),
        )
        .otherwise(F.lit(None))
    )


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
    scheme = F.regexp_extract(u, _SCHEME_CAP_RE, 1)
    host = F.regexp_extract(u, _HOSTPORT_CAP_RE, 1)
    # lenient decode: the href pattern is ASCII-only, so the lossless
    # ISO-8859-1 byte view can never mis-match whatever the charset is
    raw = F.explode(
        F.regexp_extract_all(F.decode(h, "ISO-8859-1"), F.lit(HREF_RE), F.lit(1))
    ).alias("_raw_href")
    links = pages.select(u.alias(url), scheme.alias("_scheme"), host.alias("_host"), raw)
    resolved = _resolve_href(F.col("_raw_href"), F.col("_scheme"), F.col("_host"))
    return (
        links.withColumn(out, resolved)
        # keep http(s) only: a scheme-shaped prefix that is not
        # followed by // is mailto:/javascript:/tel:/data: territory
        .filter(F.col(out).rlike(r"(?i)^https?://"))
        .select(url, out)
    )


def extract_anchor_texts(
    pages: DataFrame,
    url: str = "url",
    html: str = "html",
) -> DataFrame:
    """``(url, href, anchor)`` rows: every http(s) ``<a href>`` target
    together with its direct anchor text — the classic web-search
    relevance signal (anchor text describes the TARGET page better
    than the target's own boilerplate; Brin & Page §2.2).

    Same absolutization and http(s)-only rules as
    :func:`extract_links` (one shared resolver). Anchor text is the
    capture between the opening tag's ``>`` and the first ``<``
    (``ANCHOR_RE`` documents the nested-markup bound), entity-decoded
    with the extraction chain's ordered entity set, whitespace-
    collapsed and trimmed; rows whose anchor text is empty after that
    (image links, nested-markup anchors) are dropped — they carry no
    text signal. Unlike the ASCII-only href path this reads the
    LENIENT UTF-8 view (``make_valid_utf8``): anchor text is real page
    text and mojibake must not abort the job; non-UTF-8 pages should
    be transcoded first (the WARC ingest path already does).

    Pure per-row map work + one Generate — zero exchanges, so it
    pipelines straight into :func:`incoming_anchors`' aggregation.
    """
    from ..sources.webpages import HTML_ENTITIES, HTML_WS_RE

    u = F.col(url)
    s = F.call_function("make_valid_utf8", F.col(html).cast("string"))
    scheme = F.regexp_extract(u, _SCHEME_CAP_RE, 1)
    host = F.regexp_extract(u, _HOSTPORT_CAP_RE, 1)
    m = F.explode(F.regexp_extract_all(s, F.lit(ANCHOR_RE), F.lit(0))).alias("_m")
    base = pages.select(u.alias(url), scheme.alias("_scheme"), host.alias("_host"), m)
    text = F.regexp_extract(F.col("_m"), ANCHOR_RE, 2)
    for ent, ch in HTML_ENTITIES:
        text = F.replace(text, F.lit(ent), F.lit(ch))
    anchor = F.trim(F.regexp_replace(text, HTML_WS_RE, " "))
    resolved = _resolve_href(
        F.regexp_extract(F.col("_m"), ANCHOR_RE, 1),
        F.col("_scheme"),
        F.col("_host"),
    )
    return (
        base.select(url, resolved.alias("href"), anchor.alias("anchor"))
        .filter(F.col("href").rlike(r"(?i)^https?://"))
        .filter(F.col("anchor") != "")
    )


def incoming_anchors(
    anchors: DataFrame,
    pages: DataFrame,
    url: str = "url",
    canonicalize: bool = True,
    external_only: bool = False,
) -> DataFrame:
    """``(url, anchor, n_incoming)``: anchor texts of links POINTING AT
    pages that exist in the corpus, aggregated per (target page,
    anchor string) — the per-target anchor-text field an index build
    consumes (see ``query/bm25f.py``).

    ``anchors`` is an :func:`extract_anchor_texts` output; ``pages``
    any DataFrame carrying the corpus url column. ``canonicalize``
    joins on ``canonical_url`` of both sides so tracking-param/case
    variants of the same page collect one anchor pool (the same key
    the url-keyed dedup/upsert paths use); the output ``url`` is then
    the canonical form. ``external_only=True`` keeps only cross-host
    links (nav boilerplate from a site's own pages dominates raw
    counts; external anchors are the curated signal).

    Scale shape: both sides are big at crawl scale, so this is one
    hash join on the target url followed by one map-side-combined hash
    aggregation — the anchor relation shuffles once, the page-url
    projection once (single narrow column).
    """
    from .curation import canonical_url, host_of

    key = (lambda c: canonical_url(c)) if canonicalize else (lambda c: F.col(c) if isinstance(c, str) else c)
    a = anchors.select(
        key("href").alias("_dst_url"),
        F.col(url).alias("_src_url"),
        "anchor",
    )
    if external_only:
        a = a.filter(
            F.coalesce(host_of("_src_url") != host_of("_dst_url"), F.lit(True))
        )
    targets = pages.select(key(url).alias("_dst_url")).distinct()
    return (
        a.join(targets, "_dst_url")
        .groupBy("_dst_url", "anchor")
        .agg(F.count(F.lit(1)).alias("n_incoming"))
        .withColumnRenamed("_dst_url", url)
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


#: out-degree above which a source node's edge rows are salted across
#: the rank join (2^20 distinct out-neighbors — only true mega-hubs)
HOT_OUT_DEGREE = 1 << 20
#: salt fan-out for hot sources (each hot src's edges split S ways)
PAGERANK_SALTS = 32


def pagerank(
    edges: DataFrame,
    src: str = "src_host",
    dst: str = "dst_host",
    weight: str | None = None,
    iters: int = 5,
    damping: float = 0.85,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 3,
    hot_out_degree: int = HOT_OUT_DEGREE,
    n_salts: int = PAGERANK_SALTS,
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

    Out-degree skew (the josa of URLs — a blogspot-class hub linking
    10^7 distinct hosts): when any source's out-degree exceeds
    ``hot_out_degree``, hot sources' edge rows are salted
    ``hash(dst) % n_salts`` and the frac relation partitions on
    ``(src, salt)``, splitting a mega-hub's edges across ``n_salts``
    tasks; the rank row fans out to hot sources' salts through a
    precomputed ``(src, salt)`` relation (|srcs| + S·|hot| rows — rank
    replication, never edge replication). Graphs with no hot source
    keep the exact unsalted plan — the salted variant costs one extra
    |nodes|-sized join per iteration only when engaged, and the rank
    VALUES are identical either way (same sum, different grouping).
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
    out_w = e.groupBy("src").agg(
        F.sum("w").alias("out_w"), F.count(F.lit(1)).alias("deg")
    )
    # hot-source probe: one scalar over the |srcs|-sized degree table
    max_deg = out_w.agg(F.max("deg").alias("m")).first()["m"] or 0
    salted = max_deg > int(hot_out_degree)
    if salted:
        salt = F.when(
            F.col("deg") > int(hot_out_degree),
            F.pmod(F.xxhash64("dst"), F.lit(int(n_salts))),
        ).otherwise(F.lit(0))
        frac = (
            e.join(out_w, "src")
            .select(
                "src",
                "dst",
                (F.col("w") / F.col("out_w")).alias("frac"),
                salt.alias("salt"),
            )
            .repartition(F.col("src"), F.col("salt"))
            .persist()
        )
        # every salt a hot src MIGHT hash into (superset is harmless:
        # unmatched (src, salt) rank rows join nothing)
        src_salts = (
            out_w.select(
                "src",
                F.explode(
                    F.when(
                        F.col("deg") > int(hot_out_degree),
                        F.sequence(F.lit(0), F.lit(int(n_salts) - 1)),
                    ).otherwise(F.array(F.lit(0)))
                ).alias("salt"),
            )
            .repartition(F.col("src"))
            .persist()
        )
    else:
        # one partitioning, reused by every iteration's join
        frac = (
            e.join(out_w, "src")
            .select(
                "src", "dst", (F.col("w") / F.col("out_w")).alias("frac")
            )
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
        r_src = ranks.withColumnRenamed("node", "src")
        if salted:
            r_src = src_salts.join(r_src, "src")
            contrib = (
                frac.join(r_src, ["src", "salt"])
                .groupBy("dst")
                .agg(F.sum(F.col("frac") * F.col("rank")).alias("in_rank"))
            )
        else:
            contrib = (
                frac.join(r_src, "src")
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

def doc_boost_table(
    doc_map: DataFrame,
    host_ranks: DataFrame,
    url: str = "url",
) -> DataFrame:
    """``(doc_id, boost)``: a static per-document quality prior from
    host centrality — ``boost = ln(1 + rank·N)`` where ``rank`` is the
    page's host's PageRank (:func:`pagerank` output ``(node, rank)``)
    and ``N`` the number of graph nodes. ``rank·N`` is the centrality
    ratio against the uniform ``1/N`` baseline, so an exactly-average
    host gets ``ln 2`` regardless of corpus size and the prior is
    scale-free; the log keeps mega-hubs from drowning text relevance
    (the shape Brin & Page §4.5.1 use when blending PageRank with IR
    score). Docs whose host is absent from the graph get NO row —
    consumers blend them at 0 (``query/bm25.py::boosted_bm25_topk``).

    One hash join of the narrow ``(doc_id, host)`` projection against
    the |hosts|-sized rank relation; N rides a broadcast 1-row
    aggregate (fully lazy, no driver job)."""
    from .curation import host_of

    n = host_ranks.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    return (
        doc_map.select("doc_id", host_of(url).alias("_h"))
        .join(host_ranks.select(F.col("node").alias("_h"), "rank"), "_h")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", F.log1p(F.col("rank") * F.col("_n")).alias("boost")
        )
    )
