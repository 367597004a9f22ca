"""Centrality-boosted retrieval: doc_boost_table (host PageRank →
per-doc prior), boosted_bm25_topk (blend before the top-k cut), and
the engine/build wiring (--host-ranks builds, search_boosted)."""

from __future__ import annotations

import math

import pytest

import pyspark.sql.functions as F

from mecab_ko_lucene_analyzer_spark.engine import SearchEngine
from mecab_ko_lucene_analyzer_spark.functions.webgraph import doc_boost_table
from mecab_ko_lucene_analyzer_spark.index.build import InvertedIndex
from mecab_ko_lucene_analyzer_spark.query.bm25 import (
    bm25_topk,
    boosted_bm25_topk,
)
from mecab_ko_lucene_analyzer_spark.sources import synthesize_webpages


def test_doc_boost_table_hand_model(spark):
    """boost = ln(1 + rank·N); unranked hosts get no row; url-less
    docs get no row."""
    doc_map = spark.createDataFrame(
        [
            (1, "https://a.example/x"),
            (2, "https://b.example/y"),
            (3, "https://nowhere.example/z"),
        ],
        "doc_id long, url string",
    )
    ranks = spark.createDataFrame(
        [("a.example", 0.5), ("b.example", 0.125), ("c.example", 0.375)],
        "node string, rank double",
    )
    got = {r.doc_id: r.boost for r in doc_boost_table(doc_map, ranks).collect()}
    assert set(got) == {1, 2}
    assert got[1] == pytest.approx(math.log1p(0.5 * 3), rel=1e-12)
    assert got[2] == pytest.approx(math.log1p(0.125 * 3), rel=1e-12)


def _tiny_index(spark):
    postings = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 1), ("q", 3, 5)],
        "term string, doc_id long, tf long",
    )
    term_stats = spark.createDataFrame([("q", 3)], "term string, df long")
    doc_stats = spark.createDataFrame(
        [(1, 4), (2, 4), (3, 4)], "doc_id long, doc_len long"
    )
    corpus = spark.createDataFrame([(3, 4.0)], "n_docs long, avgdl double")
    return InvertedIndex(postings, term_stats, doc_stats, corpus)


def test_boosted_blend_reorders_and_weight0_is_identity(spark):
    idx = _tiny_index(spark)
    boosts = spark.createDataFrame(
        [(2, 3.0)], "doc_id long, boost double"
    )
    plain = [(r.doc_id, r.score) for r in bm25_topk(idx, ["q"]).collect()]
    assert [d for d, _ in plain] == [3, 1, 2]  # tf decides, then doc_id
    w0 = [
        (r.doc_id, r.score)
        for r in boosted_bm25_topk(idx, boosts, ["q"], w_boost=0.0).collect()
    ]
    assert w0 == plain
    boosted = [
        (r.doc_id, r.score)
        for r in boosted_bm25_topk(idx, boosts, ["q"], w_boost=1.0).collect()
    ]
    assert [d for d, _ in boosted] == [2, 3, 1]  # the prior lifts doc 2
    base = dict(plain)
    assert boosted[0][1] == pytest.approx(base[2] + 3.0, rel=1e-12)


def test_boost_applies_before_topk_cut(spark):
    """A boosted doc OUTSIDE the text-only top-k must surface: k=1,
    the lower-tf doc wins on boost."""
    idx = _tiny_index(spark)
    boosts = spark.createDataFrame([(1, 9.0)], "doc_id long, boost double")
    top = boosted_bm25_topk(idx, boosts, ["q"], w_boost=1.0, k=1).collect()
    assert [r.doc_id for r in top] == [1]


@pytest.fixture(scope="module")
def boosted_engine(spark, tmp_path_factory):
    """--host-ranks build over the synthetic corpus with a hand rank
    table keyed to the synthetic hosts."""
    base = str(tmp_path_factory.mktemp("boost_idx"))
    pages = synthesize_webpages(spark, 30, partitions=2)
    # hosts are example-%08d.kr — rank a handful of them
    ranks = spark.createDataFrame(
        [(f"example-{i:08d}.kr", 0.2 if i % 2 else 0.01) for i in range(30)],
        "node string, rank double",
    )
    from mecab_ko_lucene_analyzer_spark.index.build import build_and_write

    build_and_write(
        pages, base, with_blocks=True, host_ranks=ranks, lang_filter="ko"
    )
    from mecab_ko_lucene_analyzer_spark.analysis.dictionary import (
        AnalyzerOption,
    )

    return SearchEngine(pages.sparkSession, base, AnalyzerOption()), base


def test_host_ranks_build_writes_doc_boosts(boosted_engine, spark):
    _, base = boosted_engine
    b = spark.read.parquet(f"{base}/doc_boosts")
    rows = {r.doc_id: r.boost for r in b.collect()}
    assert rows, "doc_boosts written"
    # parity keys the RANK table by page index, not docID (the lang
    # filter shifts ids) — resolve through doc_map's url
    idx_of = {
        r.doc_id: int(r.url.split("example-")[1][:8])
        for r in spark.read.parquet(f"{base}/doc_map").collect()
    }
    some_odd = [v for k, v in rows.items() if idx_of[k] % 2]
    some_even = [v for k, v in rows.items() if not idx_of[k] % 2]
    assert min(some_odd) > max(some_even)
    assert min(some_odd) == pytest.approx(math.log1p(0.2 * 30), rel=1e-12)
    assert max(some_even) == pytest.approx(math.log1p(0.01 * 30), rel=1e-12)


def test_boosted_never_fetches_driver_blocks(boosted_engine, monkeypatch):
    """Round-5 router-coverage pin: the centrality blend applies
    BEFORE the top-k cut, so search_boosted is always the distributed
    postings scorer — no driver block fetch at any df."""
    engine, _ = boosted_engine
    from mecab_ko_lucene_analyzer_spark.sources.webpages import generate_text

    import mecab_ko_lucene_analyzer_spark.query.wand as wand_mod

    def _forbidden(*a, **kw):
        raise AssertionError("boosted search collected blocks driver-side")

    monkeypatch.setattr(wand_mod, "fetch_term_blocks", _forbidden)
    text = generate_text(2).split(".")[0]
    hits = engine.search_boosted(text, k=10, w_boost=0.5)
    assert hits
    assert engine.last_route == "distributed"


def test_search_boosted_weight0_matches_body_wand(boosted_engine):
    engine, _ = boosted_engine
    from mecab_ko_lucene_analyzer_spark.sources.webpages import generate_text

    text = generate_text(2).split(".")[0]
    body = engine.search(text, k=10, conjunctive=False)
    assert body
    boosted = engine.search_boosted(text, k=10, w_boost=0.0)
    assert [h["doc_id"] for h in boosted] == [h["doc_id"] for h in body]
    for bh, wh in zip(boosted, body):
        assert bh["score"] == pytest.approx(wh["score"], rel=1e-9)
    assert engine.last_route == "distributed"


def test_search_boosted_requires_boost_table(spark, tmp_path):
    pages = synthesize_webpages(spark, 10, partitions=2)
    engine = SearchEngine.build(spark, pages, str(tmp_path / "nb_idx"))
    with pytest.raises(FileNotFoundError, match="doc_boosts"):
        engine.search_boosted("다음")


def test_load_boosts_overrides(boosted_engine, spark):
    """An explicitly attached boost table wins over the build's."""
    engine, _ = boosted_engine
    from mecab_ko_lucene_analyzer_spark.sources.webpages import generate_text

    text = generate_text(2).split(".")[0]
    base_hits = engine.search_boosted(text, k=5, w_boost=1.0)
    target = base_hits[-1]["doc_id"]
    engine.load_boosts(
        spark.createDataFrame([(target, 100.0)], "doc_id long, boost double")
    )
    try:
        hits = engine.search_boosted(text, k=5, w_boost=1.0)
        assert hits[0]["doc_id"] == target
    finally:
        del engine._doc_boosts  # restore the lazy build-table probe
