"""Search-time aggregations (Elasticsearch-style facets).

The reference ships inside an Elasticsearch plugin, and the product
searches it powers are facet-heavy: every query page shows hit counts
grouped by category / maker / price band next to the ranked hits. ES
computes those as ``aggregations`` over the full *matched doc set*
(not just the top-k page). This module supplies the two workhorse
shapes over the built index:

* :func:`facet_terms` — ES ``terms`` aggregation: the top-k attribute
  values among matching docs by document count.
* :func:`date_histogram` — ES ``date_histogram``: matching-doc counts
  per calendar bucket of a timestamp attribute.

Both run over :func:`matching_docs`, the disjunctive match set the
BM25 scorer also starts from (``query/bm25.py::bm25_scored``), with
the same ``min_should_match`` precision knob.

Plan shape at 10^12 docs: the postings scan is pruned with a pushed
IN-list on ``term`` (term-partitioned store → partition pruning), the
match set is one partial+final hash aggregate, the attribute arrives
via ONE doc_id hash join (both sides huge → AQE picks sort-merge;
neither side is forced broadcast), and the facet itself is a
map-side-combined count per value followed by a TakeOrdered gather.
No driver materialization anywhere — the only driver rows are the
final k buckets.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..index.build import InvertedIndex

__all__ = [
    "matching_docs",
    "facet_terms",
    "date_histogram",
    "stats_agg",
    "percentiles_agg",
    "cardinality_agg",
    "histogram_agg",
    "sort_topk",
    "collapse_topk",
    "significant_terms",
    "top_hits_agg",
]

#: ES ``percentiles`` default percent set
DEFAULT_PERCENTS = (1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0)

# date_trunc units Spark and ANSI SQL agree on (lowercase canonical)
_INTERVALS = frozenset(
    {"hour", "day", "week", "month", "quarter", "year"}
)


def matching_docs(
    index: InvertedIndex,
    query_terms: list[str],
    min_should_match: int = 0,
) -> DataFrame:
    """``(doc_id)`` — every doc matching at least
    ``max(min_should_match, 1)`` DISTINCT query terms (the ES query
    context's disjunctive match set, the same relation BM25 scores).

    Postings carry one row per (term, doc), so the distinct-match
    count is a plain ``count(*)`` riding one hash aggregate over the
    IN-pruned scan."""
    spark = index.postings.sparkSession
    if not query_terms:
        return spark.createDataFrame([], "doc_id long")
    need = max(int(min_should_match), 1)
    matched = (
        index.postings.filter(F.col("term").isin(list(set(query_terms))))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("_matched"))
    )
    if need > 1:
        matched = matched.filter(F.col("_matched") >= need)
    return matched.select("doc_id")


def facet_terms(
    index: InvertedIndex,
    query_terms: list[str],
    doc_attrs: DataFrame,
    attr_col: str,
    k: int = 10,
    min_doc_count: int = 1,
    min_should_match: int = 0,
) -> DataFrame:
    """ES ``terms`` aggregation: ``(value, doc_count)`` — the top ``k``
    values of ``attr_col`` among matching docs, ranked doc_count desc
    then value asc (ES's default ``_count`` desc order, with the key
    as the deterministic tiebreak; integer/string keys only, so ranks
    are bit-deterministic across engines).

    ``doc_attrs`` is any ``(doc_id, <attr_col>)`` relation — the
    doc_map's url host, a crawl metadata table, a joined product
    category column. NULL attribute values get no bucket (ES's
    ``missing`` bucket is opt-in and not modeled); ``min_doc_count``
    drops sparse tail buckets exactly like the ES knob."""
    docs = matching_docs(index, query_terms, min_should_match)
    out = (
        docs.join(doc_attrs.select("doc_id", attr_col), "doc_id")
        .filter(F.col(attr_col).isNotNull())
        .groupBy(F.col(attr_col).alias("value"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )
    if min_doc_count > 1:
        out = out.filter(F.col("doc_count") >= int(min_doc_count))
    return out.orderBy(F.desc("doc_count"), F.asc("value")).limit(int(k))


def stats_agg(
    index: InvertedIndex,
    query_terms: list[str],
    doc_attrs: DataFrame,
    attr_col: str,
    min_should_match: int = 0,
) -> DataFrame:
    """ES ``stats`` metric aggregation: ONE row
    ``(count, min, max, avg, sum)`` of a numeric attribute over the
    matching docs — the price/size summary strip next to a facet
    panel. NULL attribute values are excluded from every statistic
    (ES semantics: ``count`` is the number of VALUES collected, not
    of matching docs). A query matching nothing yields
    ``(0, NULL, NULL, NULL, NULL)``.

    Plan: the match set's one aggregate plus one doc_id join, then a
    single global aggregate — partial-combined, so the final exchange
    carries one row per upstream partition."""
    docs = matching_docs(index, query_terms, min_should_match)
    v = F.col(attr_col).cast("double")
    return (
        docs.join(doc_attrs.select("doc_id", attr_col), "doc_id")
        .filter(v.isNotNull())
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.min(v).alias("min"),
            F.max(v).alias("max"),
            F.avg(v).alias("avg"),
            F.sum(v).alias("sum"),
        )
    )


def percentiles_agg(
    index: InvertedIndex,
    query_terms: list[str],
    doc_attrs: DataFrame,
    attr_col: str,
    percents: tuple[float, ...] = DEFAULT_PERCENTS,
    min_should_match: int = 0,
) -> DataFrame:
    """ES ``percentiles`` metric aggregation: ``(pct, value)`` rows —
    the named percentiles of a numeric attribute over the matching
    docs (latency/size distribution strips). NULL values are excluded;
    ``pct`` ascends.

    EXACT percentiles with linear interpolation (the ANSI
    ``percentile_cont`` law both Spark's ``percentile`` and DuckDB's
    ``quantile_cont`` implement) — correct and cross-engine-
    deterministic, but it materializes the matched value multiset per
    group. ES itself refuses exactness at scale (t-digest); the 10^12
    serving path is ``F.approx_percentile`` with an error bound, which
    this function deliberately is NOT — it is the oracle-checkable
    baseline the approximate path is judged against."""
    docs = matching_docs(index, query_terms, min_should_match)
    v = F.col(attr_col).cast("double")
    fr = [float(p) / 100.0 for p in percents]
    one = (
        docs.join(doc_attrs.select("doc_id", attr_col), "doc_id")
        .filter(v.isNotNull())
        .agg(F.percentile(v, F.array(*[F.lit(f) for f in fr])).alias("vals"))
    )
    pcts = F.array(*[F.lit(float(p)) for p in percents])
    return (
        one.select(
            F.explode(F.arrays_zip(pcts.alias("pct"), F.col("vals").alias("value"))).alias("z")
        )
        .select(F.col("z.pct").alias("pct"), F.col("z.value").alias("value"))
        .orderBy("pct")
    )


def cardinality_agg(
    index: InvertedIndex,
    query_terms: list[str],
    doc_attrs: DataFrame,
    attr_col: str,
    min_should_match: int = 0,
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """ES ``cardinality`` metric aggregation: ONE row
    ``(cardinality)`` — distinct values of ``attr_col`` among matching
    docs, NULLs excluded (ES collects values, not docs).

    ``exact=True`` is the oracle-checkable baseline (count-distinct =
    one extra exchange on the value). ``exact=False`` is the ES-parity
    scale path — ``approx_count_distinct`` (HyperLogLog++, the same
    sketch family ES uses) with relative error ``rsd``: partial
    sketches merge map-side, so the final exchange carries one sketch
    per partition regardless of cardinality — the 10^12-doc shape."""
    docs = matching_docs(index, query_terms, min_should_match)
    vals = docs.join(doc_attrs.select("doc_id", attr_col), "doc_id").filter(
        F.col(attr_col).isNotNull()
    )
    agg = (
        F.count_distinct(F.col(attr_col))
        if exact
        else F.approx_count_distinct(F.col(attr_col), rsd)
    )
    return vals.agg(agg.cast("long").alias("cardinality"))


def histogram_agg(
    index: InvertedIndex,
    query_terms: list[str],
    doc_attrs: DataFrame,
    attr_col: str,
    interval: float,
    min_should_match: int = 0,
) -> DataFrame:
    """ES numeric ``histogram`` aggregation: ``(bucket, doc_count)``
    — matching docs bucketed by ``floor(value / interval) * interval``
    (the ES bucket law, correct for negatives too), bucket ascending.
    NULL values get no bucket; empty buckets are omitted (ES
    ``min_doc_count: 0`` gap-filling is presentation, exactly as
    :func:`date_histogram` documents). One hash aggregate over the
    joined match set — the bucket count is bounded by the value range,
    never by corpus size."""
    if interval <= 0:
        raise ValueError(f"interval must be positive, got {interval!r}")
    docs = matching_docs(index, query_terms, min_should_match)
    v = F.col(attr_col).cast("double")
    bucket = F.floor(v / F.lit(float(interval))) * F.lit(float(interval))
    return (
        docs.join(doc_attrs.select("doc_id", attr_col), "doc_id")
        .filter(v.isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.asc("bucket"))
    )


def sort_topk(
    index: InvertedIndex,
    query_terms: list[str],
    doc_attrs: DataFrame,
    sort_col: str,
    k: int = 10,
    ascending: bool = False,
    min_should_match: int = 0,
) -> DataFrame:
    """ES ``sort``-by-field search: the top ``k`` MATCHING docs ordered
    by an attribute instead of by score — ``(doc_id, sort_value)``.
    Missing/NULL sort values order LAST in either direction (ES's
    ``missing: _last`` default), tie-break doc_id asc.

    Plan: match set join attrs, then TakeOrdered — never a global
    sort; the scoring work BM25 would do is skipped entirely, exactly
    like ES skips scoring when ``sort`` replaces ``_score``."""
    docs = matching_docs(index, query_terms, min_should_match)
    v = F.col("sort_value")
    order = v.asc_nulls_last() if ascending else v.desc_nulls_last()
    return (
        docs.join(
            doc_attrs.select("doc_id", F.col(sort_col).alias("sort_value")),
            "doc_id",
            "left",
        )
        .orderBy(order, F.asc("doc_id"))
        .limit(int(k))
    )


def collapse_topk(
    scored: DataFrame,
    doc_attrs: DataFrame,
    group_col: str,
    k: int = 10,
    inner_hits: int = 1,
) -> DataFrame:
    """ES field collapsing (``collapse`` on ``_search``): keep only the
    top ``inner_hits`` docs per value of ``group_col`` (host, domain,
    product family — SERP same-site dedup), then the top ``k`` rows
    overall. Returns ``(group, doc_id, score)``.

    ``scored`` is any ``(doc_id, score)`` relation (``bm25_scored``,
    the distributed router relation, a fused hybrid ranking).
    Cross-engine-deterministic ranking needs a pre-rounded score
    column (the contract query rounds to 6).

    Semantics notes (ES parity):
    * the per-group cut happens over the FULL match set, before the
      global top-k — a group's best doc can surface even when ten
      better docs share one other group;
    * docs with a NULL ``group_col`` are NOT collapsed together — each
      forms its own singleton group (ES treats missing collapse keys
      as distinct). Implemented by salting NULL keys with doc_id so
      the window partition stays per-doc — the NULL "group" can never
      become a skew bomb on a corpus where most urls lack the
      attribute.

    Plan shape: one doc_id hash join (AQE-decided), one hash exchange
    on the (salted) group key for the per-group window — grouped top-k
    is the scalable shape (never a global sort) — then TakeOrdered for
    the final ``k``.
    """
    from pyspark.sql import Window

    joined = scored.join(
        doc_attrs.select("doc_id", F.col(group_col).alias("group")),
        "doc_id",
        "left",
    )
    part_key = F.when(
        F.col("group").isNull(),
        F.concat(F.lit("\x00null\x00"), F.col("doc_id").cast("string")),
    ).otherwise(F.col("group").cast("string"))
    w = Window.partitionBy(part_key).orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= int(inner_hits))
        .select("group", "doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(int(k))
    )


def date_histogram(
    index: InvertedIndex,
    query_terms: list[str],
    doc_ts: DataFrame,
    ts_col: str = "warc_ts",
    interval: str = "day",
    min_should_match: int = 0,
) -> DataFrame:
    """ES ``date_histogram``: ``(bucket, doc_count)`` — matching-doc
    counts per calendar ``interval`` of ``ts_col``, bucket ascending.
    ``bucket`` is the truncated timestamp (the bucket's start instant).

    Buckets with zero matching docs are omitted (ES's
    ``min_doc_count: 0`` gap-filling is a presentation concern — at
    crawl scale the bucket range is decided by the UI, not the
    engine); NULL timestamps get no bucket, mirroring
    :func:`facet_terms`'s missing handling."""
    iv = interval.lower()
    if iv not in _INTERVALS:
        raise ValueError(
            f"interval must be one of {sorted(_INTERVALS)}, got {interval!r}"
        )
    docs = matching_docs(index, query_terms, min_should_match)
    ts = F.col(ts_col).cast("timestamp")
    return (
        docs.join(doc_ts.select("doc_id", ts.alias("_ts")), "doc_id")
        .filter(F.col("_ts").isNotNull())
        .groupBy(F.date_trunc(iv, F.col("_ts")).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.asc("bucket"))
    )


def significant_terms(
    index: InvertedIndex,
    query_terms: list[str],
    k: int = 10,
    min_doc_count: int = 1,
    min_should_match: int = 0,
    exclude_query_terms: bool = True,
) -> DataFrame:
    """ES ``significant_terms`` aggregation: the vocabulary terms most
    DISTINCTIVE of the matched doc set vs the whole corpus, scored
    with ES's JLH heuristic::

        score = (fg_pct - bg_pct) * (fg_pct / bg_pct)
        fg_pct = fg_df / |matched docs|,  bg_pct = df / n_docs

    Returns ``(term, fg_df, bg_df, score)`` ranked score desc / term
    asc — "what words describe THESE results?" (topic mining over a
    match set; the training-pipeline use is cluster/domain labeling).
    Terms below ``min_doc_count`` foreground docs are dropped (the ES
    noise knob); the query terms themselves are excluded by default
    (they trivially top the ranking — fg_pct is 1.0-ish by
    construction; pass ``exclude_query_terms=False`` for raw ES
    behavior, which returns them and lets the client filter).

    Plan shape: ONE semi join of postings against the matched-doc set
    (AQE broadcasts when the match set is small, hash otherwise) + one
    term hash aggregate, then a broadcast of the two scalar sizes into
    the score projection and TakeOrdered. The postings side is NOT
    term-pruned — significance needs every term in the matched docs —
    so the scan is proportional to the match set's token volume, never
    to the corpus; at 10^12 docs ES itself bounds this with shard
    sampling (``sample`` agg), the same cut a caller applies here by
    passing a sampled match set."""
    spark = index.postings.sparkSession
    matched = matching_docs(index, query_terms, min_should_match)
    fg_size = matched.count()
    if fg_size == 0:
        return spark.createDataFrame(
            [], "term string, fg_df long, bg_df long, score double"
        )
    corpus = index.corpus_stats.first()
    n_docs = corpus["n_docs"]
    fg = (
        index.postings.join(matched, "doc_id", "semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("fg_df"))
    )
    if min_doc_count > 1:
        fg = fg.filter(F.col("fg_df") >= int(min_doc_count))
    if exclude_query_terms and query_terms:
        fg = fg.filter(~F.col("term").isin(list(set(query_terms))))
    joined = fg.join(F.broadcast(index.term_stats.select("term", "df")), "term")
    fg_pct = F.col("fg_df").cast("double") / F.lit(float(fg_size))
    bg_pct = F.col("df").cast("double") / F.lit(float(n_docs))
    score = (fg_pct - bg_pct) * (fg_pct / bg_pct)
    return (
        joined.select(
            "term",
            F.col("fg_df").cast("long").alias("fg_df"),
            F.col("df").cast("long").alias("bg_df"),
            score.alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(int(k))
    )


def top_hits_agg(
    index: InvertedIndex,
    query_terms: list[str],
    scored: DataFrame,
    doc_attrs: DataFrame,
    attr_col: str,
    k_buckets: int = 5,
    size: int = 3,
    min_should_match: int = 0,
) -> DataFrame:
    """ES ``terms`` aggregation with a ``top_hits`` sub-aggregation:
    the top ``k_buckets`` attribute values by matching-doc count, each
    carrying its ``size`` best hits by score. Returns
    ``(value, doc_count, hit_rank, doc_id, score)`` — bucket order
    doc_count desc / value asc (the :func:`facet_terms` law), hits
    within a bucket score desc / doc_id asc, ``hit_rank`` 1-based.

    ``scored`` is any ``(doc_id, score)`` relation for the SAME query
    (pass a pre-rounded score column for cross-engine-deterministic
    ranks). Plan shape: the facet's two aggs pick the buckets (tiny —
    broadcast back), then ONE per-bucket window over the scored match
    set restricted to those buckets; grouped top-k, never a global
    sort."""
    from pyspark.sql import Window

    buckets = facet_terms(
        index, query_terms, doc_attrs, attr_col, k=k_buckets,
        min_should_match=min_should_match,
    )
    hits = (
        scored.join(doc_attrs.select("doc_id", attr_col), "doc_id")
        .join(
            F.broadcast(buckets.withColumnRenamed("value", attr_col)),
            attr_col,
        )
    )
    w = Window.partitionBy(attr_col).orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        hits.withColumn("hit_rank", F.row_number().over(w))
        .filter(F.col("hit_rank") <= int(size))
        .select(
            F.col(attr_col).alias("value"),
            "doc_count",
            "hit_rank",
            "doc_id",
            "score",
        )
        .orderBy(
            F.desc("doc_count"), F.asc("value"), F.asc("hit_rank")
        )
    )
