"""ES ``rescore``: re-rank the top-``window`` hits with a second,
costlier signal — here term PROXIMITY, the classic rescore query (the
first-pass BM25 bag-of-words ignores where terms sit; pages where the
query terms appear NEAR each other read as better answers).

Semantics (ES parity, ``score_mode: total`` — the default):
``final = first_pass_score + weight / (1 + min_pair_distance)`` where
``min_pair_distance`` is the smallest absolute token-position gap
between occurrences of two DISTINCT query terms in the doc. Docs
inside the window containing <2 distinct query terms get bonus 0 —
they keep their first-pass score and simply re-rank against the
boosted ones. Docs OUTSIDE the window are untouched and stay below it
(ES only ever reorders within the window).

Scale contract: the expensive signal runs on ``window`` docs, never
the corpus — that is the entire point of the rescore stage. The
positions relation is pruned twice before the pair join: a pushed
``term IN`` filter (term-partitioned postings at 10^12 docs) and a
semi join against the window's doc set (≤ ``window`` rows, broadcast).
The per-doc pair expansion is bounded by tf(query terms within one
doc) — document-length, not corpus, scale.

Reference anchor: the reference boosts phrase matches at query build
time (boost-0 subqueries, ``DanawaSearchQueryBuilder.java:214-233``);
proximity rescoring is the ranked-relevance generalization a
training-data pipeline wants (hard-negative mining needs "almost
phrase" gradations, not a binary phrase filter).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["min_pair_distance", "proximity_rescore"]


def min_pair_distance(
    tokens: DataFrame, query_terms: list[str], docs: DataFrame | None = None
) -> DataFrame:
    """``(doc_id, min_dist)`` — per doc, the smallest |position gap|
    between occurrences of two DISTINCT ``query_terms``. Docs with <2
    distinct query terms emit no row.

    ``tokens`` is any ``(doc_id, pos, term)`` relation (the
    ``term_vectors`` exploded view, or a positions-decoding scan of
    the index). ``docs`` (optional) bounds the computation to a doc
    set — the rescore window — via a semi join BEFORE the pair join."""
    pos = tokens.filter(
        F.col("term").isin(list(set(query_terms)))
    ).select("doc_id", "pos", "term")
    if docs is not None:
        pos = pos.join(F.broadcast(docs.select("doc_id")), "doc_id", "semi")
    left = pos.select(
        "doc_id", F.col("pos").alias("_lp"), F.col("term").alias("_lt")
    )
    right = pos.select(
        "doc_id", F.col("pos").alias("_rp"), F.col("term").alias("_rt")
    )
    pairs = left.join(right, "doc_id").filter(F.col("_lt") < F.col("_rt"))
    return pairs.groupBy("doc_id").agg(
        F.min(F.abs(F.col("_lp") - F.col("_rp"))).alias("min_dist")
    )


def proximity_rescore(
    scored: DataFrame,
    tokens: DataFrame,
    query_terms: list[str],
    k: int = 10,
    window: int = 50,
    weight: float = 1.0,
    round_digits: int | None = None,
) -> DataFrame:
    """ES ``rescore`` with a proximity query: take the top ``window``
    docs of ``scored`` (its own (score desc, doc_id asc) law — pass a
    pre-rounded score for cross-engine-deterministic windows), add
    ``weight / (1 + min_pair_distance)`` to each, and return the new
    top ``k`` as ``(doc_id, score)``.

    The window is FETCHED (one TakeOrdered job, ≤ ``window`` rows —
    the same bounded collect ES itself performs: rescoring always runs
    over an already-fetched window) and re-enters the plan as a
    literal relation, so the first-pass scoring subtree is planned
    exactly once and the positions scan gets a pushed
    ``doc_id IN (<window ids>)`` filter instead of a join against a
    re-planned copy of the scorer."""
    spark = scored.sparkSession
    top_rows = (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(int(window))
        .collect()
    )
    if not top_rows:
        return spark.createDataFrame([], "doc_id long, score double")
    top = spark.createDataFrame(
        [(int(r["doc_id"]), float(r["score"])) for r in top_rows],
        "doc_id long, score double",
    )
    ids = [int(r["doc_id"]) for r in top_rows]
    pruned = tokens.filter(F.col("doc_id").isin(ids))
    dist = min_pair_distance(pruned, query_terms)
    bonus = F.lit(float(weight)) / (
        F.lit(1.0) + F.col("min_dist").cast("double")
    )
    new_score = F.col("score") + F.coalesce(bonus, F.lit(0.0))
    if round_digits is not None:
        new_score = F.round(new_score, round_digits)
    return (
        F.broadcast(top).join(dist, "doc_id", "left")
        .select("doc_id", new_score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(int(k))
    )
