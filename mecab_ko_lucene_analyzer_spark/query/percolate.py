"""Percolator — reverse search (the ES ``percolate`` query): match
incoming DOCUMENTS against a table of STORED QUERIES.

Forward search asks "which docs match this query?"; percolation asks
"which stored queries match this doc?" — the alerting/routing shape a
crawl pipeline wants (saved searches firing on new pages, topic
routers fanning documents to downstream consumers, contamination
watchlists flagging matches at ingest time).

Model: a stored query is ``(query_id, terms array<string>)`` — the
analyzed term set of a registered query. A doc matches conjunctively
when it contains EVERY term (ES percolator semantics for a ``match``
query with ``operator: and``), or disjunctively with
``min_should_match`` of them.

Plan shape at 10^12 docs/day ingest: the stored-query table is small
by contract (thousands of saved searches, not billions) — it explodes
to (term, query_id, n_terms) and BROADCASTS; the doc side is one
distinct-token projection (narrow map work); matching is one hash
aggregate keyed (doc_id, query_id) counting matched terms. No
corpus-side shuffle beyond that single aggregate, and the aggregate's
key space is bounded by (docs containing any watched term) x (queries
watching them) — the selective case percolation exists for.

Reference anchor: the reference's analyzed AND query over extracted
tokens (`DanawaSearchQueryBuilder.java:266-282` bool-mode plumbing)
is exactly the stored-query shape percolated here.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["percolate"]


def percolate(
    doc_tokens: DataFrame,
    queries: DataFrame,
    min_should_match: int | None = None,
) -> DataFrame:
    """``(doc_id, query_id, n_matched)`` — stored queries matching each
    doc.

    ``doc_tokens``: ``(doc_id, term)`` — the doc side's analyzed
    tokens (duplicates fine; matching is per DISTINCT term).
    ``queries``: ``(query_id, terms array<string>)`` — small by
    contract (broadcast). Default (``min_should_match=None``) is
    conjunctive: a query matches only when ALL its terms appear
    (``n_matched == size(terms)``); pass an integer for the
    disjunctive ES ``minimum_should_match`` law. Queries with empty
    term arrays never match (ES rejects empty percolator queries).
    Output is deterministic: one row per (doc, query) pair that
    matches, ``n_matched`` = distinct matched terms."""
    q = (
        queries.filter(F.size("terms") > 0)
        .select(
            "query_id",
            # distinct size: a stored array with repeated terms must
            # still be satisfiable conjunctively
            F.size(F.array_distinct("terms")).alias("_n_terms"),
            F.explode(F.array_distinct("terms")).alias("term"),
        )
    )
    matched = (
        doc_tokens.select("doc_id", "term")
        .distinct()
        .join(F.broadcast(q), "term")
        .groupBy("doc_id", "query_id", "_n_terms")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    if min_should_match is None:
        matched = matched.filter(F.col("n_matched") == F.col("_n_terms"))
    else:
        matched = matched.filter(
            F.col("n_matched") >= int(max(min_should_match, 1))
        )
    return matched.select("doc_id", "query_id", "n_matched")
