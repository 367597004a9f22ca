"""Anchor-field index build (with_anchors=True) + BM25F serving
(engine.search_fielded): the incoming-anchor field is tokenized with
the SAME Korean analysis chain as the body and scored with the Lucene
combined-field model."""

from __future__ import annotations

import math

import pytest

import pyspark.sql.functions as F

from mecab_ko_lucene_analyzer_spark.engine import SearchEngine
from mecab_ko_lucene_analyzer_spark.index.build import InvertedIndex, K1, B
from mecab_ko_lucene_analyzer_spark.query.bm25f import bm25f_topk_postings
from mecab_ko_lucene_analyzer_spark.sources import synthesize_webpages
from mecab_ko_lucene_analyzer_spark.sources.webpages import generate_text

N_DOCS = 40


def _anchor_noun():
    """A real dictionary noun that provably appears in NO page body of
    the N_DOCS synthetic corpus — the anchor-only query term."""
    from mecab_ko_lucene_analyzer_spark.analysis.mini_dict import corpus_nouns

    bodies = " ".join(generate_text(i) for i in range(N_DOCS))
    for noun in corpus_nouns():
        if len(noun) >= 3 and noun not in bodies:
            return noun
    raise AssertionError("no corpus noun absent from the synthetic bodies")


def _linked_pages(spark):
    """Synthetic corpus where every page links to page 0 with the
    anchor-only noun as anchor text, and to the next page with a
    generic anchor."""
    noun = _anchor_noun()
    pages = synthesize_webpages(spark, N_DOCS, partitions=3)
    pid = F.regexp_extract("url", r"example-(\d+)", 1).cast("long")
    extra = F.concat(
        F.lit('<a href="https://example-00000000.kr/page">'),
        F.lit(noun),
        F.lit('</a><a href="'),
        F.format_string("https://example-%08d.kr/page", (pid + 1) % N_DOCS),
        F.lit('">다음 페이지</a>'),
    )
    return pages.withColumn(
        "html", F.concat("html", F.encode(extra, "utf-8"))
    ), noun


@pytest.fixture(scope="module")
def anchor_engine(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("anchor_idx"))
    pages, noun = _linked_pages(spark)
    engine = SearchEngine.build(spark, pages, base, with_anchors=True)
    return engine, noun, base


def test_anchor_tables_written_and_consistent(anchor_engine, spark):
    _, noun, base = anchor_engine
    ap = spark.read.parquet(f"{base}/anchor_postings")
    ads = spark.read.parquet(f"{base}/anchor_doc_stats")
    acs = spark.read.parquet(f"{base}/anchor_corpus_stats").first()
    # the anchor-only noun reached doc 0 through the analysis chain
    hit = ap.filter((F.col("term") == noun) & (F.col("doc_id") == 0)).first()
    assert hit is not None and hit["tf"] >= 1
    # doc stats are exactly the per-doc tf sums of the postings
    want = {
        r["doc_id"]: r["s"]
        for r in ap.groupBy("doc_id").agg(F.sum("tf").alias("s")).collect()
    }
    got = {r["doc_id"]: r["anchor_len"] for r in ads.collect()}
    assert got == want
    assert acs["n_anchor_docs"] == len(want)
    assert acs["anchor_len_sum"] == sum(want.values())


def test_anchor_only_term_found_only_by_fielded_search(anchor_engine):
    engine, noun, _ = anchor_engine
    # body search: the noun appears in no page text
    assert engine.search(noun, conjunctive=False) == []
    hits = engine.search_fielded(noun, k=5, anchor_weight=2.0)
    assert hits and hits[0]["doc_id"] == 0
    assert hits[0]["url"] == "https://example-00000000.kr/page"
    assert engine.last_route == "distributed"


def test_fielded_weight0_matches_body_wand(anchor_engine):
    """anchor_weight=0 must be rank-identical (and score-equal) to the
    disjunctive body WAND path."""
    engine, _, _ = anchor_engine
    text = generate_text(3).split(".")[0]
    body = engine.search(text, k=10, conjunctive=False)
    assert body, "query must match something body-side"
    fielded = engine.search_fielded(text, k=10, anchor_weight=0.0)
    assert [h["doc_id"] for h in fielded] == [h["doc_id"] for h in body]
    for fh, bh in zip(fielded, body):
        assert fh["score"] == pytest.approx(bh["score"], rel=1e-9)


def test_fielded_never_fetches_driver_blocks(anchor_engine, monkeypatch):
    """Round-5 router-coverage pin: BM25F serving is ALWAYS the
    distributed postings scorer — whatever the terms' df (the body
    path's hot-routing concern doesn't arise because there is no
    driver-cursor tier to fall into). A driver block fetch appearing
    here would be the 10^12-doc scale regression."""
    engine, noun, _ = anchor_engine
    import mecab_ko_lucene_analyzer_spark.query.wand as wand_mod

    def _forbidden(*a, **kw):
        raise AssertionError("fielded search collected blocks driver-side")

    monkeypatch.setattr(wand_mod, "fetch_term_blocks", _forbidden)
    hits = engine.search_fielded(noun, k=5, anchor_weight=2.0)
    assert hits and hits[0]["doc_id"] == 0
    assert engine.last_route == "distributed"
    # body+anchor blend over a body query too (multi-term, mixed dfs)
    text = generate_text(3).split(".")[0]
    blended = engine.search_fielded(text, k=10, anchor_weight=1.5)
    assert blended
    assert engine.last_route == "distributed"


def test_fielded_requires_anchor_build(spark, tmp_path):
    pages = synthesize_webpages(spark, 12, partitions=2)
    engine = SearchEngine.build(
        spark, pages, str(tmp_path / "plain_idx"), with_anchors=False
    )
    with pytest.raises(FileNotFoundError, match="anchor"):
        engine.search_fielded("다음", anchor_weight=1.0)


def test_anchors_stage_resumes(anchor_engine, spark):
    """A rerun of the same build skips the anchors stage (manifest)."""
    import json

    from mecab_ko_lucene_analyzer_spark.index.build import build_and_write

    _, _, base = anchor_engine
    with open(f"{base}/manifest.json") as f:
        before = json.load(f)["stages"]["anchors"]
    pages, _ = _linked_pages(spark)
    build_and_write(pages, base, with_blocks=True, with_anchors=True)
    with open(f"{base}/manifest.json") as f:
        after = json.load(f)["stages"]["anchors"]
    assert after == before  # untouched, not re-run


def test_bm25f_postings_hand_model(spark):
    """Numeric pin of the combined-field math over postings tables."""
    postings = spark.createDataFrame(
        [("q", 1, 2), ("q", 2, 1), ("x", 1, 1)],
        "term string, doc_id long, tf long",
    )
    doc_stats = spark.createDataFrame(
        [(1, 3), (2, 1)], "doc_id long, doc_len long"
    )
    corpus = spark.createDataFrame([(2, 2.0)], "n_docs long, avgdl double")
    dummy_terms = spark.createDataFrame([("q", 1)], "term string, df long")
    idx = InvertedIndex(postings, dummy_terms, doc_stats, corpus)
    ap = spark.createDataFrame([("q", 2, 3)], "term string, doc_id long, tf long")
    ads = spark.createDataFrame([(2, 4)], "doc_id long, anchor_len long")
    acs = spark.createDataFrame([(1, 4)], "n_anchor_docs long, anchor_len_sum long")
    w = 2.0
    got = {
        r["doc_id"]: r["score"]
        for r in bm25f_topk_postings(
            idx, [(ap, ads, acs.first()["anchor_len_sum"], w)], ["q"]
        ).collect()
    }
    # pooled: tf'(q,1)=2, tf'(q,2)=1+2*3=7; dl'(1)=3, dl'(2)=1+2*4=9
    # avgdl' = 2 + 2*4/2 = 6; df'(q)=2, n=2 → idf = ln(1 + 0.5/2.5)
    idf = math.log(1.2)

    def s(tf, dl):
        return idf * tf / (tf + K1 * (1 - B + B * dl / 6.0))

    assert got[1] == pytest.approx(s(2, 3), rel=1e-12)
    assert got[2] == pytest.approx(s(7, 9), rel=1e-12)

def test_title_field_end_to_end(spark, tmp_path):
    """with_titles build: the <title> text is analyzed into
    title_postings; a title-only term retrieves its doc via
    search_fielded(title_weight=...); weight 0 ignores it."""
    noun = _anchor_noun()
    pages = synthesize_webpages(spark, 20, partitions=2)
    pid = F.regexp_extract("url", r"example-(\d+)", 1).cast("long")
    # give page 7 a Korean title carrying the body-absent noun
    titled = pages.withColumn(
        "html",
        F.when(
            pid == 7,
            F.concat(
                F.encode(
                    F.concat(F.lit("<head><title> "), F.lit(noun), F.lit(" &amp; 검색 </title></head>")),
                    "utf-8",
                ),
                "html",
            ),
        ).otherwise(F.col("html")),
    )
    base = str(tmp_path / "title_idx")
    engine = SearchEngine.build(spark, titled, base, with_titles=True)
    tp = spark.read.parquet(f"{base}/title_postings")
    assert tp.filter(F.col("term") == noun).count() == 1
    assert engine.search(noun, conjunctive=False) == []  # not in any body
    hits = engine.search_fielded(noun, k=3, anchor_weight=0.0, title_weight=2.0)
    assert hits and hits[0]["url"].startswith("https://example-00000007")
    assert engine.search_fielded(noun, k=3, anchor_weight=0.0) == []


def test_both_fields_blend(spark, tmp_path):
    """anchors + titles in one build; both weights participate."""
    pages, noun = _linked_pages(spark)
    pid = F.regexp_extract("url", r"example-(\d+)", 1).cast("long")
    titled = pages.withColumn(
        "html",
        F.concat(
            F.encode(
                F.concat(
                    F.lit("<title>페이지 "), pid.cast("string"), F.lit("</title>")
                ),
                "utf-8",
            ),
            "html",
        ),
    )
    base = str(tmp_path / "both_idx")
    engine = SearchEngine.build(
        spark, titled, base, with_anchors=True, with_titles=True
    )
    # the anchor-only noun still resolves through the anchor field even
    # with the title field active
    hits = engine.search_fielded(noun, k=3, anchor_weight=2.0, title_weight=1.0)
    assert hits and hits[0]["doc_id"] == 0
    # '페이지' lives only in titles
    title_hits = engine.search_fielded(
        "페이지", k=3, anchor_weight=0.0, title_weight=1.0
    )
    assert title_hits
    with pytest.raises(FileNotFoundError):
        SearchEngine.build(
            spark,
            synthesize_webpages(spark, 8, partitions=1),
            str(tmp_path / "nt_idx"),
        ).search_fielded("x", anchor_weight=0.0, title_weight=1.0)
