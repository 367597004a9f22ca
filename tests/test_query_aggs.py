"""Search-time aggregations (query/aggs.py): ES terms facet and
date_histogram over the matched doc set."""

from __future__ import annotations

import pytest

from mecab_ko_lucene_analyzer_spark.index.build import InvertedIndex
from mecab_ko_lucene_analyzer_spark.query.aggs import (
    date_histogram,
    facet_terms,
    matching_docs,
    stats_agg,
)


def _hand_index(spark):
    """5 docs over terms a/b/c: doc1 {a}, doc2 {a,b}, doc3 {a,b,c},
    doc4 {c}, doc5 {b}."""
    postings = spark.createDataFrame(
        [
            ("a", 1, 2), ("a", 2, 1), ("a", 3, 1),
            ("b", 2, 2), ("b", 3, 1), ("b", 5, 1),
            ("c", 3, 2), ("c", 4, 4),
        ],
        "term string, doc_id long, tf long",
    )
    term_stats = spark.createDataFrame(
        [("a", 3), ("b", 3), ("c", 2)], "term string, df long"
    )
    doc_stats = spark.createDataFrame(
        [(i, 4) for i in (1, 2, 3, 4, 5)], "doc_id long, doc_len long"
    )
    corpus = spark.createDataFrame([(5, 4.0)], "n_docs long, avgdl double")
    return InvertedIndex(postings, term_stats, doc_stats, corpus)


def _attrs(spark):
    # doc5 has a NULL attribute; doc6 exists only in the attr table
    return spark.createDataFrame(
        [
            (1, "news"),
            (2, "blog"),
            (3, "news"),
            (4, "shop"),
            (5, None),
            (6, "ghost"),
        ],
        "doc_id long, source string",
    )


# --------------------------------------------------------------------------
# matching_docs
# --------------------------------------------------------------------------


def test_matching_docs_disjunctive(spark):
    idx = _hand_index(spark)
    got = {r.doc_id for r in matching_docs(idx, ["a", "c"]).collect()}
    assert got == {1, 2, 3, 4}


def test_matching_docs_min_should_match(spark):
    idx = _hand_index(spark)
    got = {
        r.doc_id
        for r in matching_docs(idx, ["a", "b", "c"], min_should_match=2).collect()
    }
    assert got == {2, 3}


def test_matching_docs_empty_query(spark):
    idx = _hand_index(spark)
    assert matching_docs(idx, []).count() == 0


# --------------------------------------------------------------------------
# facet_terms
# --------------------------------------------------------------------------


def test_facet_counts_and_order(spark):
    """Query {a,c} matches docs 1-4 → news:2 (docs 1,3), blog:1,
    shop:1. Rank: count desc, value asc."""
    idx = _hand_index(spark)
    rows = facet_terms(idx, ["a", "c"], _attrs(spark), "source").collect()
    assert [(r.value, r.doc_count) for r in rows] == [
        ("news", 2),
        ("blog", 1),
        ("shop", 1),
    ]


def test_facet_null_attr_and_unmatched_docs_excluded(spark):
    """doc5 matches 'b' but its attr is NULL → no bucket; doc6 has an
    attr but never matches → not counted."""
    idx = _hand_index(spark)
    rows = facet_terms(idx, ["b"], _attrs(spark), "source").collect()
    assert [(r.value, r.doc_count) for r in rows] == [("blog", 1), ("news", 1)]


def test_facet_k_and_min_doc_count(spark):
    idx = _hand_index(spark)
    top1 = facet_terms(idx, ["a", "c"], _attrs(spark), "source", k=1).collect()
    assert [(r.value, r.doc_count) for r in top1] == [("news", 2)]
    dense = facet_terms(
        idx, ["a", "c"], _attrs(spark), "source", min_doc_count=2
    ).collect()
    assert [(r.value, r.doc_count) for r in dense] == [("news", 2)]


def test_facet_respects_min_should_match(spark):
    """msm=2 over {a,b,c} keeps docs 2,3 → blog:1, news:1."""
    idx = _hand_index(spark)
    rows = facet_terms(
        idx, ["a", "b", "c"], _attrs(spark), "source", min_should_match=2
    ).collect()
    assert [(r.value, r.doc_count) for r in rows] == [("blog", 1), ("news", 1)]


# --------------------------------------------------------------------------
# date_histogram
# --------------------------------------------------------------------------


def _doc_ts(spark):
    return spark.createDataFrame(
        [
            (1, "2025-01-01 08:00:00"),
            (2, "2025-01-01 23:59:59"),
            (3, "2025-01-02 00:00:00"),
            (4, "2025-03-15 12:00:00"),
            (5, None),
        ],
        "doc_id long, warc_ts string",
    )


def test_date_histogram_day_buckets(spark):
    """Query {a,c} matches docs 1-4: Jan 1 has docs 1+2, Jan 2 doc 3,
    Mar 15 doc 4; ascending bucket order; no empty-bucket fill."""
    idx = _hand_index(spark)
    rows = date_histogram(idx, ["a", "c"], _doc_ts(spark), interval="day").collect()
    assert [(str(r.bucket), r.doc_count) for r in rows] == [
        ("2025-01-01 00:00:00", 2),
        ("2025-01-02 00:00:00", 1),
        ("2025-03-15 00:00:00", 1),
    ]


def test_date_histogram_month_and_null_ts(spark):
    """Month buckets pool Jan docs; doc5 (NULL ts) matches 'b' but
    contributes no bucket."""
    idx = _hand_index(spark)
    rows = date_histogram(
        idx, ["a", "b", "c"], _doc_ts(spark), interval="month"
    ).collect()
    assert [(str(r.bucket), r.doc_count) for r in rows] == [
        ("2025-01-01 00:00:00", 3),
        ("2025-03-01 00:00:00", 1),
    ]


def test_date_histogram_rejects_bad_interval(spark):
    idx = _hand_index(spark)
    with pytest.raises(ValueError, match="interval"):
        date_histogram(idx, ["a"], _doc_ts(spark), interval="fortnight")


# --------------------------------------------------------------------------
# stats_agg
# --------------------------------------------------------------------------


def _nums(spark):
    # doc4 carries a NULL metric (excluded from every statistic)
    return spark.createDataFrame(
        [(1, 10.0), (2, 30.0), (3, 20.0), (4, None), (5, 99.0)],
        "doc_id long, price double",
    )


def test_stats_agg_values(spark):
    """Query {a,c} matches docs 1-4; doc4's NULL price is excluded:
    count=3 over values {10,30,20}."""
    idx = _hand_index(spark)
    row = stats_agg(idx, ["a", "c"], _nums(spark), "price").collect()[0]
    assert (row["count"], row["min"], row["max"], row["avg"], row["sum"]) == (
        3, 10.0, 30.0, 20.0, 60.0,
    )


def test_stats_agg_no_matches(spark):
    idx = _hand_index(spark)
    row = stats_agg(idx, ["zzz"], _nums(spark), "price").collect()[0]
    assert row["count"] == 0
    assert row["min"] is None and row["sum"] is None
