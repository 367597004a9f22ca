"""Second agg batch (query/aggs.py): ES range, extended_stats,
value_count / weighted_avg, composite pagination, filters buckets."""

from __future__ import annotations

import math

import pytest

from mecab_ko_lucene_analyzer_spark.index.build import InvertedIndex
from mecab_ko_lucene_analyzer_spark.query.aggs import (
    composite_agg,
    extended_stats_agg,
    filters_agg,
    range_agg,
    value_count_agg,
    weighted_avg_agg,
)


def _hand_index(spark):
    """doc1 {a}, doc2 {a,b}, doc3 {a,b,c}, doc4 {c}, doc5 {b}."""
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


def _nums(spark):
    # doc4 NULL value; doc3 NULL weight
    return spark.createDataFrame(
        [
            (1, 10.0, 1.0, "news", "en"),
            (2, 25.0, 2.0, "blog", "ko"),
            (3, 40.0, None, "news", "en"),
            (4, None, 3.0, "shop", "ko"),
            (5, 55.0, 4.0, "news", "ko"),
        ],
        "doc_id long, v double, w double, source string, lang string",
    )


# ----------------------------------------------------------------- range


def test_range_agg_half_open_and_empty_buckets(spark):
    idx = _hand_index(spark)
    out = range_agg(
        idx,
        ["a", "b", "c"],  # all 5 docs match
        _nums(spark),
        "v",
        [(None, 25.0), (25.0, 55.0), (55.0, None), (100.0, None)],
    ).collect()
    got = {r["key"]: r["doc_count"] for r in out}
    # values collected: 10, 25, 40, 55 (doc4 NULL excluded)
    assert got == {"*-25": 1, "25-55": 2, "55-*": 1, "100-*": 0}
    assert len(out) == 4  # every configured range appears


def test_range_agg_empty_ranges_rejected(spark):
    """{"range": {"ranges": []}} via engine.aggregate must fail loudly
    (ValueError), not crash with a malformed stack(0) analysis error."""
    idx = _hand_index(spark)
    with pytest.raises(ValueError, match="at least one range"):
        range_agg(idx, ["a"], _nums(spark), "v", [])


def test_range_agg_overlapping_ranges_double_count(spark):
    idx = _hand_index(spark)
    got = {
        r["key"]: r["doc_count"]
        for r in range_agg(
            idx, ["a"], _nums(spark), "v", [(0.0, 50.0), (20.0, None)]
        ).collect()
    }
    # docs 1,2,3 match 'a' → values 10, 25, 40
    assert got == {"0-50": 3, "20-*": 2}


# -------------------------------------------------------- extended_stats


def test_extended_stats_population_variance(spark):
    idx = _hand_index(spark)
    row = extended_stats_agg(idx, ["a", "b"], _nums(spark), "v").first()
    # docs 1,2,3,5 → values 10, 25, 40, 55
    vals = [10.0, 25.0, 40.0, 55.0]
    n = len(vals)
    avg = sum(vals) / n
    sq = sum(x * x for x in vals)
    var = sq / n - avg * avg
    assert row["count"] == n
    assert row["min"] == 10.0 and row["max"] == 55.0
    assert row["avg"] == pytest.approx(avg)
    assert row["sum_of_squares"] == pytest.approx(sq)
    assert row["variance"] == pytest.approx(var)
    assert row["std_deviation"] == pytest.approx(math.sqrt(var))
    assert row["upper"] == pytest.approx(avg + 2 * math.sqrt(var))
    assert row["lower"] == pytest.approx(avg - 2 * math.sqrt(var))


# ------------------------------------------- value_count / weighted_avg


def test_value_count_excludes_nulls(spark):
    idx = _hand_index(spark)
    assert (
        value_count_agg(idx, ["a", "b", "c"], _nums(spark), "v").first()[
            "value_count"
        ]
        == 4
    )


def test_weighted_avg_skips_null_value_or_weight(spark):
    idx = _hand_index(spark)
    row = weighted_avg_agg(
        idx, ["a", "b", "c"], _nums(spark), "v", "w"
    ).first()
    # usable rows: doc1 (10,1), doc2 (25,2), doc5 (55,4) — doc3 NULL w,
    # doc4 NULL v
    want = (10 * 1 + 25 * 2 + 55 * 4) / (1 + 2 + 4)
    assert row["value_count"] == 3
    assert row["weighted_avg"] == pytest.approx(want)


# ------------------------------------------------------------ composite


def test_composite_agg_page_walk_is_gapless(spark):
    idx = _hand_index(spark)
    attrs = _nums(spark)
    full = composite_agg(
        idx, ["a", "b", "c"], attrs, ["source", "lang"], size=100
    ).collect()
    keys = [(r["source"], r["lang"]) for r in full]
    assert keys == sorted(keys)  # composite key ascending
    # bucket space: docs 1..5 → (news,en)x2, (blog,ko), (shop,ko), (news,ko)
    assert dict(
        (((r["source"], r["lang"]), r["doc_count"])) for r in full
    ) == {
        ("blog", "ko"): 1,
        ("news", "en"): 2,
        ("news", "ko"): 1,
        ("shop", "ko"): 1,
    }
    # page walk: size 2, then after the last key of each page
    p1 = composite_agg(
        idx, ["a", "b", "c"], attrs, ["source", "lang"], size=2
    ).collect()
    after = (p1[-1]["source"], p1[-1]["lang"])
    p2 = composite_agg(
        idx, ["a", "b", "c"], attrs, ["source", "lang"], size=2, after=after
    ).collect()
    walked = [(r["source"], r["lang"]) for r in p1 + p2]
    assert walked == keys  # gapless, dup-free


def test_composite_agg_after_arity_check(spark):
    idx = _hand_index(spark)
    with pytest.raises(ValueError):
        composite_agg(
            idx, ["a"], _nums(spark), ["source", "lang"], after=("news",)
        )


# -------------------------------------------------------------- filters


def test_filters_agg_named_buckets_with_zero(spark):
    idx = _hand_index(spark)
    got = {
        r["bucket"]: r["doc_count"]
        for r in filters_agg(
            idx, {"ab": ["a", "b"], "conly": ["c"], "none": ["zzz"]}
        ).collect()
    }
    # 'ab' bag matches docs 1,2,3,5 (distinct, not double-counting 2,3)
    assert got == {"ab": 4, "conly": 2, "none": 0}


def test_filters_agg_empty_spec(spark):
    idx = _hand_index(spark)
    assert filters_agg(idx, {}).count() == 0


# ----------------------------------------------------- adjacency_matrix


def test_adjacency_matrix_singles_pairs_and_zeros(spark):
    from mecab_ko_lucene_analyzer_spark.query.aggs import (
        adjacency_matrix_agg,
    )

    idx = _hand_index(spark)
    got = {
        r["bucket"]: r["doc_count"]
        for r in adjacency_matrix_agg(
            idx, {"ab": ["a", "b"], "conly": ["c"], "none": ["zzz"]}
        ).collect()
    }
    # ab → {1,2,3,5}, conly → {3,4}; intersection {3}
    assert got == {
        "ab": 4,
        "conly": 2,
        "none": 0,
        "ab&conly": 1,
        "ab&none": 0,
        "conly&none": 0,
    }


# ------------------------------------------------------------ terms_set


def test_terms_set_per_doc_threshold(spark):
    from mecab_ko_lucene_analyzer_spark.query.aggs import terms_set_topk
    from mecab_ko_lucene_analyzer_spark.query.bm25 import bm25_scored

    idx = _hand_index(spark)
    # doc → distinct matches over {a,b,c}: 1→1, 2→2, 3→3, 4→1, 5→1
    required = spark.createDataFrame(
        [(1, 1), (2, 3), (3, 2), (4, 2), (5, 1)],
        "doc_id long, required_matches int",
    )
    got = {
        r["doc_id"]: r["score"]
        for r in terms_set_topk(
            idx, ["a", "b", "c"], required, k=10
        ).collect()
    }
    # doc2 needs 3 (has 2) → out; doc4 needs 2 (has 1) → out
    assert set(got) == {1, 3, 5}
    base = {
        r["doc_id"]: r["score"]
        for r in bm25_scored(idx, ["a", "b", "c"]).collect()
    }
    for d, s in got.items():
        assert s == pytest.approx(base[d], rel=1e-12)  # scores unchanged


# ------------------------------------------------- date_range / missing


def test_date_range_shares_the_range_law(spark):
    from mecab_ko_lucene_analyzer_spark.query.aggs import date_range_agg

    idx = _hand_index(spark)
    ts = spark.createDataFrame(
        [(1, 100), (2, 200), (3, 300), (4, None), (5, 400)],
        "doc_id long, ts long",
    )
    got = {
        r["key"]: r["doc_count"]
        for r in date_range_agg(
            idx, ["a", "b", "c"], ts, "ts",
            [(None, 200), (200, 400), (400, None), (1000, None)],
        ).collect()
    }
    assert got == {"*-200": 1, "200-400": 2, "400-*": 1, "1000-*": 0}


def test_missing_counts_null_and_absent_rows(spark):
    from mecab_ko_lucene_analyzer_spark.query.aggs import missing_agg

    idx = _hand_index(spark)
    attrs = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "y")], "doc_id long, a string"
    )  # docs 4, 5 have NO attrs row at all
    row = missing_agg(idx, ["a", "b", "c"], attrs, "a").first()
    # matching docs 1..5: missing = doc2 (NULL) + docs 4, 5 (absent)
    assert row["missing_count"] == 3


def test_rare_terms_exact_long_tail(spark):
    from mecab_ko_lucene_analyzer_spark.query.aggs import rare_terms_agg

    idx = _hand_index(spark)
    rows = [(r["term"], r["df"]) for r in rare_terms_agg(idx, max_df=2).collect()]
    assert rows == [("c", 2)]  # a,b have df 3
    rows = [
        (r["term"], r["df"])
        for r in rare_terms_agg(idx, max_df=3, k=2).collect()
    ]
    assert rows == [("c", 2), ("a", 3)]  # df asc, term asc, k cut
    with pytest.raises(ValueError, match="max_df"):
        rare_terms_agg(idx, max_df=0)


def test_sampler_significant_terms_bounds_the_foreground(spark):
    """sample_size large = identical to plain significant_terms;
    sample_size 1 restricts the foreground to the single best BM25 doc
    (doc3: matches a+b+c), changing fg counts exactly as the JLH over
    that one-doc sample says."""
    from mecab_ko_lucene_analyzer_spark.query.aggs import (
        sampler_significant_terms,
        significant_terms,
    )

    idx = _hand_index(spark)
    full = significant_terms(
        idx, ["a"], k=10, exclude_query_terms=True
    ).collect()
    sampled_all = sampler_significant_terms(
        idx, ["a"], sample_size=100, k=10, score_round=6
    ).collect()
    assert [tuple(r) for r in sampled_all] == [tuple(r) for r in full]
    one = sampler_significant_terms(
        idx, ["a"], sample_size=1, k=10, score_round=6
    ).collect()
    # best 'a' doc by BM25 is doc1 (tf 2, same doc_len): fg = {a};
    # query term excluded => empty frame
    assert one == []
    # with exclusion off the sample's own vocabulary surfaces
    one_raw = sampler_significant_terms(
        idx, ["a"], sample_size=1, k=10,
        exclude_query_terms=False, score_round=6,
    ).collect()
    assert [(r["term"], r["fg_df"], r["bg_df"]) for r in one_raw] == [
        ("a", 1, 3)
    ]


def test_multi_terms_composite_buckets(spark):
    from mecab_ko_lucene_analyzer_spark.query.aggs import multi_terms_agg

    idx = _hand_index(spark)
    rows = [
        tuple(r)
        for r in multi_terms_agg(
            idx, ["a", "b", "c"], _nums(spark), ["source", "lang"]
        ).collect()
    ]
    # docs 1..5 all match; (news,en) x2 {1,3}; singles sorted by key
    assert rows == [
        ("news", "en", 2),
        ("blog", "ko", 1),
        ("news", "ko", 1),
        ("shop", "ko", 1),
    ]
    # k cut keeps the count-desc head
    assert [
        tuple(r)
        for r in multi_terms_agg(
            idx, ["a", "b", "c"], _nums(spark), ["source", "lang"], k=1
        ).collect()
    ] == [("news", "en", 2)]
    # docs with a NULL key component are skipped
    import pyspark.sql.functions as F

    attrs = _nums(spark).withColumn(
        "lang", F.when(F.col("doc_id") == 1, None).otherwise(F.col("lang"))
    )
    rows2 = [
        tuple(r)
        for r in multi_terms_agg(
            idx, ["a", "b", "c"], attrs, ["source", "lang"]
        ).collect()
    ]
    assert ("news", "en", 1) in rows2  # doc3 only; doc1 skipped
    with pytest.raises(ValueError, match="at least one field"):
        multi_terms_agg(idx, ["a"], _nums(spark), [])
