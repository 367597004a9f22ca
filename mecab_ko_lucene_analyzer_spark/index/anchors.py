"""Anchor-field index tables: incoming anchor text, tokenized with the
SAME Korean analysis chain as the body field, keyed to the target
page's docID.

The reference indexes one analyzed field per document
(``MeCabKoStandardTokenizer`` over the page text); web-scale ranking
adds the incoming-anchor field on top — the text OTHER pages use to
link here, the signal web search has indexed since Brin & Page §2.2.
This module materializes that field against an existing build's
``doc_map``; ``query/bm25f.py::bm25f_topk_postings`` consumes it with
the Lucene combined-field model.

Scale shape: anchors extract per-row (zero exchanges), key to docIDs
via ONE hash join on the canonical target url against the doc_map
(|docs| rows, far smaller than the link relation at crawl scale — a
page has many outlinks), tokenize in the same Arrow-batched
``tokens_table`` pass the body build uses, and aggregate to
``(term, doc_id, tf)`` with one map-side-combined hash agg. A mega-hub
target (everyone links the portal frontpage) concentrates one doc_id;
partial aggregation absorbs it the same way a hot term is absorbed in
the body build.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def anchor_postings_table(
    pages: DataFrame,
    doc_map: DataFrame,
    mode: str = "standard",
    compound_noun_min_length: int = 3,
    external_only: bool = False,
) -> DataFrame:
    """``(url, html)`` pages + ``(doc_id, url)`` doc_map →
    ``(term, doc_id, tf)`` anchor postings: term frequencies of the
    analyzed incoming anchor text per target document.

    Positions are deliberately not kept — the anchor field is a
    bag-of-terms relevance signal (phrase queries stay body-only).
    ``external_only=True`` drops same-host links (nav boilerplate)
    before the join; sources with no parseable host are kept.
    """
    from ..functions.curation import canonical_url, host_of
    from ..functions.udfs import tokens_table
    from ..functions.webgraph import extract_anchor_texts

    if "html" not in pages.columns:
        raise ValueError(
            "anchor_postings_table: pages must carry an 'html' column "
            "(anchor text is extracted from the raw pages)"
        )
    anchors = extract_anchor_texts(pages)
    if external_only:
        anchors = anchors.filter(
            F.coalesce(host_of("url") != host_of("href"), F.lit(True))
        )
    targets = doc_map.select("doc_id", canonical_url("url").alias("_dst"))
    occurrences = anchors.select(
        canonical_url(F.col("href")).alias("_dst"), "anchor"
    ).join(targets, "_dst")
    toks = tokens_table(
        occurrences, "doc_id", "anchor", mode, compound_noun_min_length
    )
    return toks.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))


def title_postings_table(
    pages: DataFrame,
    doc_map: DataFrame,
    mode: str = "standard",
    compound_noun_min_length: int = 3,
) -> DataFrame:
    """``(url, html)`` pages + ``(doc_id, url)`` doc_map →
    ``(term, doc_id, tf)`` title postings: the analyzed ``<title>``
    text per document (``sources/webpages.py::title_of``) — the third
    classic web field next to body and incoming anchors. Same shape as
    the anchor build minus the link resolution: titles are the doc's
    OWN text, so the only join is the exact-url doc_id resolution
    against the doc_map."""
    from ..functions.udfs import tokens_table
    from ..sources.webpages import title_of

    if "html" not in pages.columns:
        raise ValueError(
            "title_postings_table: pages must carry an 'html' column"
        )
    titles = (
        pages.select("url", title_of("html").alias("title"))
        .filter(F.col("title") != "")
        .join(doc_map, "url")
    )
    toks = tokens_table(titles, "doc_id", "title", mode, compound_noun_min_length)
    return toks.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
