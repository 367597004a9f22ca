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


# --------------------------------------------------------------------------
# percentiles / cardinality / histogram / sort (session 15)
# --------------------------------------------------------------------------


def _nums2(spark):
    # doc3 NULL value; doc6 not matched by any query term
    return spark.createDataFrame(
        [(1, 10), (2, 20), (3, None), (4, 40), (5, 50), (6, 999)],
        "doc_id long, n long",
    )


def test_percentiles_linear_interpolation(spark):
    from mecab_ko_lucene_analyzer_spark.query.aggs import percentiles_agg

    idx = _hand_index(spark)
    # matched docs for a|b = {1,2,3,5}; values {10,20,50} (doc3 NULL)
    rows = percentiles_agg(
        idx, ["a", "b"], _nums2(spark), "n", percents=(0.0, 50.0, 75.0, 100.0)
    ).collect()
    got = {r["pct"]: r["value"] for r in rows}
    # percentile_cont law over sorted [10,20,50]: rank = p*(n-1)
    assert got[0.0] == 10.0
    assert got[50.0] == 20.0
    assert got[75.0] == pytest.approx(35.0)  # 20 + 0.5*(50-20)
    assert got[100.0] == 50.0
    assert [r["pct"] for r in rows] == [0.0, 50.0, 75.0, 100.0]


def test_cardinality_exact_and_approx(spark):
    from mecab_ko_lucene_analyzer_spark.query.aggs import cardinality_agg

    idx = _hand_index(spark)
    attrs = _attrs(spark)  # 1 news, 2 blog, 3 news, 4 shop, 5 NULL
    [r] = cardinality_agg(idx, ["a", "b"], attrs, "source").collect()
    assert r["cardinality"] == 2  # news + blog (doc4 unmatched, 5 NULL)
    # HLL path: tiny sets are exact under the sketch too
    [ra] = cardinality_agg(
        idx, ["a", "b"], attrs, "source", exact=False
    ).collect()
    assert ra["cardinality"] == 2
    [empty] = cardinality_agg(idx, [], attrs, "source").collect()
    assert empty["cardinality"] == 0


def test_histogram_bucket_law(spark):
    from mecab_ko_lucene_analyzer_spark.query.aggs import histogram_agg

    idx = _hand_index(spark)
    rows = histogram_agg(idx, ["a", "b"], _nums2(spark), "n", 15.0).collect()
    # values {10,20,50} -> buckets 0, 15, 45; NULL gets none
    assert [(r["bucket"], r["doc_count"]) for r in rows] == [
        (0.0, 1), (15.0, 1), (45.0, 1)
    ]
    with pytest.raises(ValueError):
        histogram_agg(idx, ["a"], _nums2(spark), "n", 0)


def test_histogram_negative_values_floor(spark):
    """ES bucket law floor(v/interval)*interval is correct for
    negatives (rounds toward -inf, not toward zero)."""
    from mecab_ko_lucene_analyzer_spark.query.aggs import histogram_agg

    idx = _hand_index(spark)
    neg = spark.createDataFrame(
        [(1, -1), (2, -20), (3, 5), (5, 14)], "doc_id long, n long"
    )
    rows = histogram_agg(idx, ["a", "b"], neg, "n", 10.0).collect()
    assert [(r["bucket"], r["doc_count"]) for r in rows] == [
        (-20.0, 1), (-10.0, 1), (0.0, 1), (10.0, 1)
    ]


def test_sort_topk_order_nulls_last_and_ties(spark):
    from mecab_ko_lucene_analyzer_spark.query.aggs import sort_topk

    idx = _hand_index(spark)
    attrs = spark.createDataFrame(
        [(1, 20), (2, 20), (3, None), (5, 50)], "doc_id long, n long"
    )
    rows = sort_topk(idx, ["a", "b"], attrs, "n", k=10).collect()
    # desc: 50, then the 20-tie breaks doc_id asc, NULL last
    assert [(r["doc_id"], r["sort_value"]) for r in rows] == [
        (5, 50), (1, 20), (2, 20), (3, None)
    ]
    up = sort_topk(idx, ["a", "b"], attrs, "n", k=10, ascending=True).collect()
    assert [r["doc_id"] for r in up] == [1, 2, 5, 3]  # NULL still last
    # missing attr row behaves like NULL (left join), k cuts
    rows2 = sort_topk(
        idx, ["a", "b"], attrs.filter("doc_id != 3"), "n", k=2
    ).collect()
    assert [r["doc_id"] for r in rows2] == [5, 1]


# --------------------------------------------------------------------------
# significant_terms / top_hits (session 15)
# --------------------------------------------------------------------------


def _sig_index(spark):
    """_hand_index plus term d in docs 1,2 (df 2) for significance."""
    postings = spark.createDataFrame(
        [
            ("a", 1, 2), ("a", 2, 1), ("a", 3, 1),
            ("b", 2, 2), ("b", 3, 1), ("b", 5, 1),
            ("c", 3, 2), ("c", 4, 4),
            ("d", 1, 1), ("d", 2, 1),
        ],
        "term string, doc_id long, tf long",
    )
    term_stats = spark.createDataFrame(
        [("a", 3), ("b", 3), ("c", 2), ("d", 2)], "term string, df long"
    )
    doc_stats = spark.createDataFrame(
        [(i, 4) for i in (1, 2, 3, 4, 5)], "doc_id long, doc_len long"
    )
    corpus = spark.createDataFrame([(5, 4.0)], "n_docs long, avgdl double")
    return InvertedIndex(postings, term_stats, doc_stats, corpus)


def test_significant_terms_jlh_hand_model(spark):
    """Query 'a' matches {1,2,3}; term d sits in 2/3 foreground vs 2/5
    corpus -> JLH (2/3-2/5)*(2/3 / 2/5) = 4/9; b scores lower, c is
    anti-correlated (negative); the query term itself is excluded."""
    from mecab_ko_lucene_analyzer_spark.query.aggs import significant_terms

    idx = _sig_index(spark)
    rows = significant_terms(idx, ["a"], k=10).collect()
    got = {r["term"]: r for r in rows}
    assert set(got) == {"b", "c", "d"}
    assert got["d"]["score"] == pytest.approx(4.0 / 9.0, rel=1e-12)
    assert (got["d"]["fg_df"], got["d"]["bg_df"]) == (2, 2)
    assert got["c"]["score"] < 0 < got["b"]["score"] < got["d"]["score"]
    assert [r["term"] for r in rows] == ["d", "b", "c"]  # score desc
    # raw ES behavior keeps the query term (and it ranks first)
    raw = significant_terms(idx, ["a"], k=10, exclude_query_terms=False)
    assert raw.first()["term"] == "a"
    # min_doc_count prunes the foreground tail
    pruned = significant_terms(idx, ["a"], k=10, min_doc_count=2).collect()
    assert {r["term"] for r in pruned} == {"b", "d"}
    # empty match set -> empty relation
    assert significant_terms(idx, ["zzz"], k=5).collect() == []


def test_top_hits_buckets_and_ranks(spark):
    from mecab_ko_lucene_analyzer_spark.query.aggs import top_hits_agg
    from mecab_ko_lucene_analyzer_spark.query.bm25 import bm25_scored
    import pyspark.sql.functions as F

    idx = _sig_index(spark)
    attrs = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y"), (4, "y"), (5, "x")],
        "doc_id long, source string",
    )
    scored = bm25_scored(idx, ["a", "b"]).select(
        "doc_id", F.round("score", 6).alias("score")
    )
    rows = top_hits_agg(
        idx, ["a", "b"], scored, attrs, "source", k_buckets=2, size=2
    ).collect()
    # bucket x: matched {1,2,5} count 3, top-2 hits 2 then 1;
    # bucket y: matched {3} count 1
    assert [
        (r["value"], r["doc_count"], r["hit_rank"], r["doc_id"]) for r in rows
    ] == [("x", 3, 1, 2), ("x", 3, 2, 1), ("y", 1, 1, 3)]
    # size=1 cuts within buckets, k_buckets=1 keeps only the top bucket
    one = top_hits_agg(
        idx, ["a", "b"], scored, attrs, "source", k_buckets=1, size=1
    ).collect()
    assert [(r["value"], r["doc_id"]) for r in one] == [("x", 2)]
