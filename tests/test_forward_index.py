"""Doc-keyed forward index (round-6): by-document access without
scanning the term-keyed postings.

Contract under test:
* ``build_and_write(with_forward=True)`` writes ``forward`` —
  ``doc_id → sorted array<struct<term,tf>>`` — and ``load_index``
  attaches it;
* ``mlt_seed_terms`` routes through the forward table when present,
  and the seed fetch reads ONLY the forward files (never postings /
  partials) — the round-5 verdict's flagged scale-killer;
* all three seed routes (forward, explicit seed_postings, postings
  doc_id-filter fallback) rank identical terms.
"""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F
import pytest

from mecab_ko_lucene_analyzer_spark.index import build_and_write, load_index
from mecab_ko_lucene_analyzer_spark.index.build import InvertedIndex
from mecab_ko_lucene_analyzer_spark.query.expand import mlt_seed_terms
from mecab_ko_lucene_analyzer_spark.sources import synthesize_webpages

SEED = 3


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("fwd") / "idx")
    pages = synthesize_webpages(spark, 120, partitions=4)
    build_and_write(
        pages, base, lang_filter="ko", with_blocks=True, with_forward=True
    )
    return base


def test_forward_table_written_and_loaded(spark, built):
    idx = load_index(spark, built)
    assert idx.forward is not None
    rows = idx.forward.filter(F.col("doc_id") == SEED).collect()
    assert len(rows) == 1
    terms = rows[0]["terms"]
    assert terms and all(t["tf"] >= 1 for t in terms)
    # sorted by term (sort_array over struct sorts on the first field)
    names = [t["term"] for t in terms]
    assert names == sorted(names)


def test_forward_matches_postings(spark, built):
    idx = load_index(spark, built)
    via_postings = sorted(
        (r["term"], r["tf"])
        for r in idx.postings.filter(F.col("doc_id") == SEED)
        .select("term", "tf")
        .collect()
    )
    via_forward = sorted(
        (t["term"], t["tf"])
        for t in idx.forward.filter(F.col("doc_id") == SEED).first()["terms"]
    )
    assert via_forward == via_postings


def test_mlt_seed_fetch_touches_only_forward(spark, built):
    """The seed ranking plan must read the forward files and nothing
    else from the index directory (postings/partials stay untouched)."""
    idx = load_index(spark, built)
    corpus = idx.corpus_stats.first()
    seed = (
        idx.forward.filter(F.col("doc_id") == SEED)
        .select(F.explode("terms").alias("t"))
        .select(F.col("t.term").alias("term"), F.col("t.tf").alias("tf"))
    )
    ranked = seed.join(idx.term_stats.select("term", "df"), "term").withColumn(
        "tfidf",
        F.col("tf")
        * F.log1p(
            (F.lit(corpus["n_docs"]) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ),
    )
    files = ranked.inputFiles()
    assert any("/forward/" in f for f in files)
    assert not any("/partials/" in f or "/postings/" in f for f in files)


def test_three_seed_routes_agree(spark, built):
    idx = load_index(spark, built)
    via_forward = mlt_seed_terms(idx, SEED, m_terms=5)
    # fallback route: same index with the forward table detached
    bare = InvertedIndex(
        idx.postings, idx.term_stats, idx.doc_stats, idx.corpus_stats
    )
    via_postings = mlt_seed_terms(bare, SEED, m_terms=5)
    explicit = idx.postings.filter(F.col("doc_id") == SEED).select("term", "tf")
    via_param = mlt_seed_terms(bare, SEED, m_terms=5, seed_postings=explicit)
    assert via_forward == via_postings == via_param
    assert len(via_forward) == 5


def test_resume_skips_completed_forward_stage(spark, built):
    """Re-running the identical build must skip every stage including
    forward (manifest + _SUCCESS), leaving the output byte-identical."""
    import os

    mtime = os.path.getmtime(f"{built}/forward/_SUCCESS")
    pages = synthesize_webpages(spark, 120, partitions=4)
    build_and_write(
        pages, built, lang_filter="ko", with_blocks=True, with_forward=True
    )
    assert os.path.getmtime(f"{built}/forward/_SUCCESS") == mtime
