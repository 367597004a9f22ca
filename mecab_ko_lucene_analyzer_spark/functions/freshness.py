"""Freshness (recency) prior for web ranking.

Completes the classic static-prior pair next to link centrality
(``functions/webgraph.py::doc_boost_table``): crawl corpora carry a
fetch timestamp per page (``warc_ts`` in the WARC/Common-Crawl layout,
``sources/warc.py``), and web ranking blends text relevance with an
exponential recency decay so fresh pages outrank stale duplicates of
equal text score.

The boost is a half-life decay::

    boost(d) = 2 ** (-age_days(d) / half_life_days)

so a page exactly ``half_life_days`` older than the reference instant
contributes half the prior of a just-fetched page, and the prior is in
``(0, 1]`` — the same bounded, scale-free shape as the centrality
prior, consumable by the SAME blender
(``query/bm25.py::boosted_bm25_topk``: ``score' = bm25 + w·boost``)
and the same ``doc_boosts`` build stage.

Determinism: the reference instant (``now``) defaults to the corpus
maximum timestamp — a pure function of the input (reproducible builds,
resumable stages, stable test fixtures), riding a broadcast 1-row
aggregate exactly like ``doc_boost_table``'s node count. Pass an
explicit ``now`` for serving-time recomputation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = ["freshness_boost_table", "combine_boosts"]

_SECONDS_PER_DAY = 86400.0


def freshness_boost_table(
    doc_ts: DataFrame,
    half_life_days: float = 30.0,
    ts_col: str = "warc_ts",
    now: Column | str | None = None,
) -> DataFrame:
    """``(doc_id, boost)`` from a ``(doc_id, <ts_col>)`` relation.

    ``boost = 2^(-age_days / half_life_days)`` with ``age_days``
    measured against ``now`` (default: the corpus max timestamp via a
    broadcast 1-row aggregate — deterministic, fully lazy, no driver
    job). Docs with a NULL timestamp get NO row — like docs without
    link evidence, consumers blend them at 0 rather than inventing an
    age.

    Plan: one narrow projection + (when ``now`` is defaulted) a
    broadcast scalar cross-join — zero data-proportional exchanges, so
    at 10^12 docs this is a single map-shaped pass over the
    ``(doc_id, ts)`` projection.
    """
    if half_life_days <= 0:
        raise ValueError(f"half_life_days must be > 0, got {half_life_days}")
    ts = F.col(ts_col).cast("timestamp")
    rows = doc_ts.filter(ts.isNotNull()).select(
        "doc_id", ts.cast("double").alias("_epoch")
    )
    if now is None:
        scalars = rows.agg(F.max("_epoch").alias("_now"))
        rows = rows.crossJoin(F.broadcast(scalars))
    else:
        now_col = F.lit(now) if isinstance(now, str) else now
        rows = rows.withColumn("_now", now_col.cast("timestamp").cast("double"))
    age_days = (F.col("_now") - F.col("_epoch")) / F.lit(_SECONDS_PER_DAY)
    return rows.select(
        "doc_id",
        F.pow(F.lit(2.0), -age_days / F.lit(float(half_life_days))).alias("boost"),
    )


def combine_boosts(*tables: DataFrame) -> DataFrame:
    """Sum independent ``(doc_id, boost)`` priors into one table.

    Additive combination keeps each prior's absence-means-zero
    convention intact: a doc present in only one table gets exactly
    that table's boost (union → one hash aggregate; no outer-join
    chain). Weighting belongs to the caller — scale a table's
    ``boost`` column before combining, or keep the single blend weight
    at query time (``boosted_bm25_topk(w_boost=...)``).
    """
    if not tables:
        raise ValueError("combine_boosts needs at least one table")
    out = tables[0].select("doc_id", "boost")
    for t in tables[1:]:
        out = out.unionByName(t.select("doc_id", "boost"))
    if len(tables) == 1:
        return out
    return out.groupBy("doc_id").agg(F.sum("boost").alias("boost"))
