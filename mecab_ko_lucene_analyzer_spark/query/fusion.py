"""Hybrid retrieval: Reciprocal Rank Fusion of bounded rankings.

RRF (Cormack, Clarke & Buettcher, SIGIR 2009): each ranking ``r``
contributes ``1 / (k_rrf + rank_r(d))`` to document ``d``; documents
absent from a ranking contribute nothing from it. ``k_rrf = 60`` is
the canonical constant (the value Elasticsearch's ``rrf`` retriever
documents as its default ``rank_constant``).

This fuses a LEXICAL ranking (BM25 over the inverted index) with a
SEMANTIC ranking (embedding cosine top-k) — the standard hybrid-search
shape a web-scale corpus wants: BM25 nails exact/rare-term matches,
embeddings recall paraphrases, and rank fusion needs no score
calibration between the two incomparable scales.

Scale contract: the fusion consumes ALREADY-BOUNDED rankings — each
side's top-N cut (BM25 WAND / ANN at 10^12 docs does the expensive
work). RRF itself only ever touches <= sum(N) rows, so the
single-partition rank windows here are over top-N relations BY
CONTRACT, never over a corpus-scale relation. Callers fusing an
unbounded relation are holding it wrong; :func:`ranked` enforces the
cut with ``n``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..index.build import InvertedIndex

__all__ = ["ranked", "rrf_fuse", "hybrid_bm25_cosine_topk"]

#: canonical RRF rank constant (SIGIR'09 paper and the ES default)
RRF_K = 60


def ranked(
    scored: DataFrame,
    n: int,
    score_col: str = "score",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``n`` cut of ``scored`` as ``(id_col, rank)`` (1-based).

    Order law: ``score_col`` desc, ``id_col`` asc — callers wanting
    cross-engine-deterministic ranks must pass an already-rounded
    score column (ties inside rounding noise would otherwise rank
    differently between engines). The window is single-partition:
    acceptable ONLY because the output is cut to ``n`` and the input
    is expected to be a per-modality top-N relation already (see
    module doc).
    """
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return (
        scored.select(id_col, F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= n)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    k_rrf: int = RRF_K,
    id_col: str = "doc_id",
    round_digits: int | None = 6,
) -> DataFrame:
    """Fuse ``(id, rank)`` relations into ``(id, rrf_score)`` top-``k``.

    ``rrf_score(d) = sum over rankings containing d of 1/(k_rrf+rank)``.
    IEEE addition over the <=len(rankings) contributions per doc is
    order-insensitive for 2 inputs and the result is rounded, so the
    figure is bit-stable across engines. Ties break by ``id_col`` asc.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    contribs = [
        r.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k_rrf)) + F.col("rank").cast("double"))).alias(
                "contrib"
            ),
        )
        for r in rankings
    ]
    unioned = contribs[0]
    for c in contribs[1:]:
        unioned = unioned.unionByName(c)
    score = F.sum("contrib")
    if round_digits is not None:
        score = F.round(score, round_digits)
    return (
        unioned.groupBy(id_col)
        .agg(score.alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(k)
    )


def hybrid_bm25_cosine_topk(
    index: InvertedIndex,
    query_terms: list[str],
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_candidates: int = 50,
    k_rrf: int = RRF_K,
    round_digits: int | None = 6,
) -> DataFrame:
    """Hybrid top-``k``: RRF of BM25(``query_terms``) and cosine
    similarity to ``emb``'s vector ``query_vec_id``.

    Plan shape: the lexical side is the shared disjunctive scorer
    (IN-pruned postings scan -> broadcast stats joins -> one hash
    aggregate) cut to ``n_candidates``; the semantic side is
    ``cosine_topk`` (broadcast single query vector over the embedding
    scan, window cut per query). Both sides round scores BEFORE
    ranking so ranks are engine-deterministic; fusion itself touches
    ``<= 2*n_candidates`` rows.
    """
    from ..functions.similarity import cosine_topk
    from .bm25 import bm25_scored

    lex_scored = bm25_scored(index, query_terms)
    if round_digits is not None:
        lex_scored = lex_scored.select(
            "doc_id", F.round("score", round_digits).alias("score")
        )
    lex = ranked(lex_scored, n_candidates)

    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    # cosine_topk rounds before its own rank window and excludes the
    # query vector itself; vec_id aligns with doc_id by corpus contract
    sem_scored = cosine_topk(emb, q, k=n_candidates, round_digits=round_digits)
    sem = ranked(
        sem_scored.select(F.col("vec_id").alias("doc_id"), F.col("cosine")),
        n_candidates,
        score_col="cosine",
    )
    return rrf_fuse([lex, sem], k=k, k_rrf=k_rrf, round_digits=round_digits)
