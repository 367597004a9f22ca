"""Inverted-index construction (I1–I5) — the stage the reference hands
to Lucene (``DanawaBulkTextIndexer.java:106`` → ES shard indexing); here
it is a native Spark plan.

Plan discipline (the part that must survive 100×):

* tokenization (the expensive Arrow UDF) happens **exactly once**: every
  derived table (term/doc/corpus stats) is computed *from the postings
  relation*, never from a second scan of the corpus. ``doc_len`` is
  ``sum(tf)`` over a doc's postings — identical to the token count.
* the corpus is pruned to ``(url, text)`` before the docID range
  shuffle, so page ``html`` bytes never cross the wire.
* one wide exchange builds postings (``groupBy(term, doc_id)`` with
  map-side partial aggregation); stats reuse that output.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.udfs import tokens_table
from .docids import assign_doc_ids

__all__ = ["InvertedIndex", "build_index", "build_and_write", "load_index"]

K1 = 1.2
B = 0.75


def _stats_from_postings(postings: DataFrame):
    term_stats = postings.groupBy("term").agg(F.count("*").alias("df"))
    doc_stats = postings.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    corpus_stats = doc_stats.agg(
        F.count("*").alias("n_docs"), F.avg("doc_len").alias("avgdl")
    )
    return term_stats, doc_stats, corpus_stats


@dataclass
class InvertedIndex:
    """The queryable index: four DataFrames (≙ Iceberg tables)."""

    postings: DataFrame  # term, doc_id, tf, positions array<int>
    term_stats: DataFrame  # term, df
    doc_stats: DataFrame  # doc_id, doc_len
    corpus_stats: DataFrame  # n_docs, avgdl

    def cache(self) -> "InvertedIndex":
        # caching postings makes the derived stats single-pass too
        self.postings.cache()
        for df in (self.term_stats, self.doc_stats, self.corpus_stats):
            df.cache()
        return self


def doc_table(
    pages: DataFrame,
    lang_filter: str | None = "ko",
    with_doc_ids: bool = True,
) -> DataFrame:
    """Pruned, docID-stamped corpus: ``(doc_id, url, text)``."""
    if lang_filter is not None:
        pages = pages.filter(F.col("lang") == lang_filter)
    pages = pages.select("url", "text")  # prune before any shuffle
    if with_doc_ids:
        pages = assign_doc_ids(pages)
    elif "doc_id" not in pages.columns:
        raise ValueError("with_doc_ids=False requires an existing doc_id column")
    return pages


def build_index(
    pages: DataFrame,
    mode: str = "standard",
    compound_noun_min_length: int = 3,
    lang_filter: str | None = "ko",
    with_doc_ids: bool = True,
) -> InvertedIndex:
    """webpages → inverted index (lazy: call ``.cache()`` or use
    :func:`build_and_write` to avoid recomputing tokenization when more
    than one member table is consumed)."""
    if not with_doc_ids and "doc_id" in pages.columns:
        docs = pages if lang_filter is None else pages.filter(F.col("lang") == lang_filter)
    else:
        docs = doc_table(pages, lang_filter, with_doc_ids)
    tokens = tokens_table(docs, "doc_id", "text", mode, compound_noun_min_length)
    postings = (
        tokens.groupBy("term", "doc_id")
        .agg(
            F.count("*").alias("tf"),
            F.sort_array(F.collect_list("position")).alias("positions"),
        )
    )
    return InvertedIndex(postings, *_stats_from_postings(postings))


def build_and_write(
    pages: DataFrame,
    base_path: str,
    mode: str = "standard",
    compound_noun_min_length: int = 3,
    lang_filter: str | None = "ko",
) -> InvertedIndex:
    """Materialize the index: ONE tokenize+shuffle pass writes postings;
    stats derive from the written postings (cheap re-scan of a narrow
    parquet), then the whole index is reloaded lazily."""
    spark = pages.sparkSession
    idx = build_index(pages, mode, compound_noun_min_length, lang_filter)
    idx.postings.write.mode("overwrite").parquet(f"{base_path}/postings")
    postings = spark.read.parquet(f"{base_path}/postings")
    term_stats, doc_stats, corpus_stats = _stats_from_postings(postings)
    term_stats.write.mode("overwrite").parquet(f"{base_path}/term_stats")
    doc_stats.write.mode("overwrite").parquet(f"{base_path}/doc_stats")
    corpus_stats.write.mode("overwrite").parquet(f"{base_path}/corpus_stats")
    return load_index(spark, base_path)


def load_index(spark: SparkSession, base_path: str) -> InvertedIndex:
    return InvertedIndex(
        spark.read.parquet(f"{base_path}/postings"),
        spark.read.parquet(f"{base_path}/term_stats"),
        spark.read.parquet(f"{base_path}/doc_stats"),
        spark.read.parquet(f"{base_path}/corpus_stats"),
    )
