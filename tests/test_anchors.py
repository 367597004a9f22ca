"""Anchor-text extraction, incoming-anchor aggregation, and BM25F
(field-weighted combined-field scoring over body + anchor text)."""

from __future__ import annotations

import math

import pytest

import pyspark.sql.functions as F

from mecab_ko_lucene_analyzer_spark.functions.webgraph import (
    extract_anchor_texts,
    extract_links,
    incoming_anchors,
)
from mecab_ko_lucene_analyzer_spark.query.bm25f import (
    bm25f_topk,
    weighted_field_tokens,
)


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode("utf-8") if h is not None else None) for u, h in rows],
        "url string, html binary",
    )


def test_extract_anchor_texts_matrix(spark):
    rows = [
        (
            "https://src.example/dir/page",
            '<a href="https://abs.example/x">Visit\n  X</a>'  # ws collapse
            "<a href='//proto.example/y'>proto rel</a>"
            '<a href="/root/z" rel=nofollow>root &amp; rel</a>'  # entity
            '<a href="https://img.example/i"><img src=i.png></a>'  # nested: drop
            '<a href="https://sp.example/s">&nbsp; </a>'  # nbsp-only: drop
            '<a href="mailto:a@b.c">mail text</a>'  # non-http: drop
            '<a href="rel/skip.html">rel text</a>'  # path-relative: drop
            '<A HREF="HTTP://CASE.EXAMPLE/K">대문자 태그</A>',
        ),
        ("https://empty.example/", "<p>no links</p>"),
        ("https://null.example/", None),
    ]
    got = sorted(
        (r.url, r.href, r.anchor)
        for r in extract_anchor_texts(_pages(spark, rows)).collect()
    )
    assert got == [
        ("https://src.example/dir/page", "HTTP://CASE.EXAMPLE/K", "대문자 태그"),
        ("https://src.example/dir/page", "https://abs.example/x", "Visit X"),
        ("https://src.example/dir/page", "https://proto.example/y", "proto rel"),
        ("https://src.example/dir/page", "https://src.example/root/z", "root & rel"),
    ]


def test_anchor_hrefs_subset_of_links(spark):
    """Every (url, href) an anchor row carries is also an extract_links
    row — one shared resolver, no drift."""
    rows = [
        (
            f"https://h{i % 3}.example/d{i}",
            f'<a href="https://h{(i + 1) % 4}.example/p{i}">t{i}</a>'
            f'<a href="/x{i}">local {i}</a>',
        )
        for i in range(30)
    ]
    pages = _pages(spark, rows)
    links = {(r.url, r.href) for r in extract_links(pages).collect()}
    anchors = {(r.url, r.href) for r in extract_anchor_texts(pages).collect()}
    assert anchors <= links
    assert len(anchors) == 60  # every injected anchor has text


def test_extract_anchor_texts_lenient_on_mojibake(spark):
    """Malformed UTF-8 bytes in the page must not abort extraction
    (make_valid_utf8 view) and ASCII anchors still come through."""
    html = b'junk \xff\xfe mojibake <a href="https://ok.example/p">ok text</a>'
    pages = _pages(spark, []).sparkSession.createDataFrame(
        [("https://m.example/", html)], "url string, html binary"
    )
    got = extract_anchor_texts(pages).collect()
    assert [(r.href, r.anchor) for r in got] == [("https://ok.example/p", "ok text")]


def test_extract_anchor_texts_plan_has_no_exchange(spark):
    pages = _pages(spark, [("https://a.example/", '<a href="/x">t</a>')])
    plan = extract_anchor_texts(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_incoming_anchors_canonicalize_and_external(spark):
    rows = [
        (
            "https://a.example/1",
            # case/tracking-param variants of b's url: canonical join
            '<a href="https://B.example/x?utm_source=t">b one</a>'
            '<a href="https://b.example/x">b one</a>'  # same anchor → n=2
            '<a href="https://b.example/x">b two</a>'
            '<a href="https://a.example/2">self site</a>'
            '<a href="https://gone.example/404">dangling</a>',
        ),
        ("https://b.example/x", '<a href="https://a.example/2">to a2</a>'),
        ("https://a.example/2", "<p>leaf</p>"),
    ]
    pages = _pages(spark, rows)
    anchors = extract_anchor_texts(pages)
    got = sorted(
        (r.url, r.anchor, r.n_incoming)
        for r in incoming_anchors(anchors, pages).collect()
    )
    assert got == [
        ("https://a.example/2", "self site", 1),
        ("https://a.example/2", "to a2", 1),
        ("https://b.example/x", "b one", 2),
        ("https://b.example/x", "b two", 1),
    ]
    ext = sorted(
        (r.url, r.anchor, r.n_incoming)
        for r in incoming_anchors(anchors, pages, external_only=True).collect()
    )
    # the a.example → a.example self-site link is gone
    assert ext == [
        ("https://a.example/2", "to a2", 1),
        ("https://b.example/x", "b one", 2),
        ("https://b.example/x", "b two", 1),
    ]


def _toks(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, term string")


def test_bm25f_single_field_weight1_is_plain_bm25(spark):
    """[(body, 1.0)] must reproduce plain BM25 exactly (hand-computed)."""
    body = _toks(
        spark,
        [(1, "a"), (1, "b"), (1, "a"), (2, "a"), (2, "c"), (3, "b"), (3, "b")],
    )
    got = {r.doc_id: r.score for r in bm25f_topk([(body, 1.0)], ["a"], k=10).collect()}
    n, avgdl = 3.0, (3 + 2 + 2) / 3.0
    df = 2.0
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def s(tf, dl):
        return idf * tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))

    assert got[1] == pytest.approx(round(s(2, 3), 6), abs=1e-9)
    assert got[2] == pytest.approx(round(s(1, 2), 6), abs=1e-9)
    assert 3 not in got


def test_bm25f_anchor_field_lifts_anchor_rich_doc(spark):
    """Two docs, same body tf for the query term; one doc has the term
    in incoming anchor text → it must rank first, and the pooled
    lengths/frequencies must match the hand model."""
    body = _toks(spark, [(1, "q"), (1, "x"), (2, "q"), (2, "x")])
    anchor = _toks(spark, [(1, "q"), (2, "y")])
    w = 2.0
    got = [
        (r.doc_id, r.score)
        for r in bm25f_topk([(body, 1.0), (anchor, w)], ["q"], k=2).collect()
    ]
    assert [d for d, _ in got] == [1, 2]
    # hand model: dl' = 2 + 2w for both docs; tf'(q,1)=1+w, tf'(q,2)=1
    n = 2.0
    avgdl = 2 + 2 * w
    idf = math.log(1.0 + (n - 2 + 0.5) / (2 + 0.5))

    def s(tf):
        return idf * tf / (tf + 1.2 * (1 - 0.75 + 0.75 * avgdl / avgdl))

    assert got[0][1] == pytest.approx(round(s(1 + w), 6), abs=1e-9)
    assert got[1][1] == pytest.approx(round(s(1.0), 6), abs=1e-9)


def test_bm25f_docs_missing_a_field_still_score(spark):
    """A doc absent from the anchor field is still a corpus member with
    the smaller pooled length (field sparsity must not drop docs)."""
    body = _toks(spark, [(1, "q"), (2, "q"), (2, "z")])
    anchor = _toks(spark, [(2, "z")])
    got = {r.doc_id for r in bm25f_topk([(body, 1.0), (anchor, 3.0)], ["q"]).collect()}
    assert got == {1, 2}


def test_weighted_field_tokens_drops_zero_weight(spark):
    body = _toks(spark, [(1, "a")])
    anchor = _toks(spark, [(1, "b")])
    pooled = weighted_field_tokens([(body, 1.0), (anchor, 0.0)])
    assert [(r.doc_id, r.term, r.w) for r in pooled.collect()] == [(1, "a", 1.0)]
    with pytest.raises(ValueError):
        weighted_field_tokens([(body, 0.0)])


def test_bm25f_tiebreak_and_k(spark):
    """Identical docs tie on score → doc_id asc decides; limit honors k."""
    body = _toks(spark, [(i, t) for i in range(1, 6) for t in ("q", "x")])
    got = [r.doc_id for r in bm25f_topk([(body, 1.0)], ["q"], k=3).collect()]
    assert got == [1, 2, 3]

def test_title_of_matrix(spark):
    from mecab_ko_lucene_analyzer_spark.sources.webpages import title_of

    rows = [
        ("no", b"<head></head><body>x</body>"),
        ("plain", "<title>삼성 노트북</title>".encode()),
        ("attrs", b'<TITLE class="a"> Spaced\n  Title </TITLE>'),
        ("entity", b"<title>A &amp; B</title>"),
        ("two", b"<title>first</title><title>second</title>"),
        ("nested", b"<title>cut <b>here</b></title>"),
        ("mojibake", b"\xff\xfe<title>ok</title>"),
        ("null", None),
    ]
    df = spark.createDataFrame(rows, "k string, html binary")
    got = {r.k: r.t for r in df.select("k", title_of("html").alias("t")).collect()}
    assert got == {
        "no": "",
        "plain": "삼성 노트북",
        "attrs": "Spaced Title",
        "entity": "A & B",
        "two": "first",
        "nested": "cut",
        "mojibake": "ok",
        "null": None,
    }
