"""Inverted-index construction (I1–I5) — the stage the reference hands
to Lucene (``DanawaBulkTextIndexer.java:106`` → ES shard indexing); here
it is a native Spark plan.

v1 row-level postings (one row per (term, doc): tf + positions array),
plus the aggregate statistics BM25 needs. The block/varint compressed
format (I3/I4 with salting) layers on top of this in ``codec.py``.

Shuffle budget: exactly one wide exchange — ``groupBy(term, doc_id)``
benefits from map-side partial aggregation; doc stats reuse the token
table before the exchange; corpus stats are a scalar aggregate.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.udfs import tokens_table
from .docids import assign_doc_ids

__all__ = ["InvertedIndex", "build_index"]

K1 = 1.2
B = 0.75


@dataclass
class InvertedIndex:
    """The queryable index: four DataFrames (≙ Iceberg tables)."""

    postings: DataFrame  # term, doc_id, tf, positions array<int>
    term_stats: DataFrame  # term, df
    doc_stats: DataFrame  # doc_id, doc_len
    corpus_stats: DataFrame  # n_docs, avgdl

    def cache(self) -> "InvertedIndex":
        for df in (self.postings, self.term_stats, self.doc_stats, self.corpus_stats):
            df.cache()
        return self

    def write(self, base_path: str, mode: str = "overwrite") -> None:
        self.postings.write.mode(mode).parquet(f"{base_path}/postings")
        self.term_stats.write.mode(mode).parquet(f"{base_path}/term_stats")
        self.doc_stats.write.mode(mode).parquet(f"{base_path}/doc_stats")
        self.corpus_stats.write.mode(mode).parquet(f"{base_path}/corpus_stats")


def build_index(
    pages: DataFrame,
    mode: str = "standard",
    compound_noun_min_length: int = 3,
    lang_filter: str | None = "ko",
    with_doc_ids: bool = True,
) -> InvertedIndex:
    """webpages → inverted index.

    ``lang_filter`` is pushed to the parquet scan (partition/predicate
    pruning); tokenization runs once and feeds postings, doc and corpus
    stats.
    """
    if lang_filter is not None:
        pages = pages.filter(F.col("lang") == lang_filter)
    if with_doc_ids:
        pages = assign_doc_ids(pages)
    tokens = tokens_table(pages, "doc_id", "text", mode, compound_noun_min_length)

    postings = (
        tokens.groupBy("term", "doc_id")
        .agg(
            F.count("*").alias("tf"),
            F.sort_array(F.collect_list("position")).alias("positions"),
        )
    )
    term_stats = postings.groupBy("term").agg(F.count("*").alias("df"))
    doc_stats = tokens.groupBy("doc_id").agg(F.count("*").alias("doc_len"))
    corpus_stats = doc_stats.agg(
        F.count("*").alias("n_docs"), F.avg("doc_len").alias("avgdl")
    )
    return InvertedIndex(postings, term_stats, doc_stats, corpus_stats)
