"""Corpus input table (the engine's only external input shape).

Per ``BASELINE.json`` ``input_hint``, the engine reads an Iceberg/Parquet
table of Common-Crawl-style web pages::

    url: string, warc_ts: timestamp, html: binary, text: string, lang: string

Two constructors:

* :func:`synthesize_webpages` — deterministic synthetic Korean-ish corpus
  (FIXTURES.md §F1): text is generated per ``doc index`` with a seeded
  RNG, drawing eojeols from the pinned mini-dictionary, so tokenization
  is exact under the fallback segmenter. Generation is distributed
  (``spark.range`` + ``mapInPandas``), i.e. no driver-side loop — the
  same generator scales to arbitrarily many rows.
* :func:`webpages_from_documents` — adapts the driver-provided
  ``documents.parquet`` to the webpages shape (identity text
  extraction; byte-identical ``text`` per ``url`` is the per-row
  invariant).
"""

from __future__ import annotations

import random
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F
import pyspark.sql.types as T

from ..analysis.mini_dict import JOSA, corpus_nouns

__all__ = [
    "synthesize_webpages",
    "webpages_from_documents",
    "generate_text",
    "WEBPAGES_SCHEMA",
    "extract_html_text",
    "html_text_column",
    "HTML_SCRIPT_RE",
    "HTML_STYLE_RE",
    "HTML_COMMENT_RE",
    "HTML_TAG_RE",
    "HTML_WS_RE",
    "HTML_ENTITIES",
]

WEBPAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

_SEED = 42
_ENGLISH = ["spark", "index", "query", "search", "engine", "data", "web", "page"]
_VERBS = [("하", "다"), ("보", "았다"), ("가", "는다"), ("읽", "었다"), ("만들", "고")]
_HOT_NOUNS = [
    "검색", "엔진", "문서", "색인", "질의", "한국어", "데이터", "처리",
    "삼성전자", "검색엔진", "형태소분석", "데이터처리", "웹페이지",
]
_JOSA_LIST = list(JOSA)


def generate_text(i: int) -> str:
    """Deterministic Korean-ish page text for doc index ``i`` (seeded by
    index — stable under any partitioning/retries)."""
    rng = random.Random(_SEED * 1_000_003 + i)
    nouns = corpus_nouns()
    sentences = []
    for _ in range(rng.randint(1, 12)):
        eojeols = []
        for _ in range(rng.randint(2, 9)):
            r = rng.random()
            if r < 0.55:
                w = nouns[rng.randrange(len(nouns))]
            elif r < 0.80:
                w = _HOT_NOUNS[rng.randrange(len(_HOT_NOUNS))]
            elif r < 0.88:
                w = _ENGLISH[rng.randrange(len(_ENGLISH))]
            elif r < 0.93:
                w = str(rng.randint(1, 9999))
            else:
                stem, end = _VERBS[rng.randrange(len(_VERBS))]
                w = stem + end
            if r < 0.80 and rng.random() < 0.7:
                w += _JOSA_LIST[rng.randrange(len(_JOSA_LIST))]
            eojeols.append(w)
        sentences.append(" ".join(eojeols) + ".")
    return " ".join(sentences)


def synthesize_webpages(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic webpages corpus of ``n`` rows."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts = [generate_text(int(i)) for i in ids]
            yield pd.DataFrame(
                {
                    "url": [f"https://example-{i:08d}.kr/page" for i in ids],
                    "warc_ts": pd.to_datetime("2025-01-01")
                    + pd.to_timedelta(ids, unit="s"),
                    "html": [
                        b"<html><body>" + t.encode("utf-8") + b"</body></html>"
                        for t in texts
                    ],
                    "text": texts,
                    "lang": ["ko" if i % 20 != 19 else "en" for i in ids],
                }
            )

    rng_df = spark.range(0, n, numPartitions=partitions or max(1, n // 5000))
    return rng_df.mapInPandas(gen, WEBPAGES_SCHEMA)


# --------------------------------------------------------------------------
# HTML → text extraction (ingestion stage 0 over the html:binary column)
# --------------------------------------------------------------------------
# The north rule's per-row invariant is "byte-identical extracted text
# per url": extraction must be a pure function of the page bytes — same
# output on every executor, every retry, every partitioning. Hence a
# Catalyst-only chain (decode → strip script/style/comment blocks →
# strip tags → decode the standard named entities → collapse
# whitespace), zero Python in the row path. The patterns stay in the
# RE2-compatible subset (no backrefs, no lookaround) so the DuckDB
# oracle in ``__spark_entry__`` replays them byte-for-byte — the same
# contract pii_redact's patterns follow.

HTML_SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script[^>]*>"
HTML_STYLE_RE = r"(?is)<style\b[^>]*>.*?</style[^>]*>"
HTML_COMMENT_RE = r"(?s)<!--.*?-->"
HTML_TAG_RE = r"<[^>]*>"
# explicit class on purpose: Java's \s and RE2's \s disagree on \x0b,
# so the shared pattern spells out the characters both engines agree on
HTML_WS_RE = "[ \\t\\r\\n\\f\\x0b]+"

# ordered: &amp; decodes LAST so "&amp;lt;" yields the literal text
# "&lt;" (double-encoding stays encoded once, per the HTML5 algorithm).
# Numeric references beyond &#39; are NOT decoded — documented bound of
# the entity set (covers the five XML entities + nbsp, which dominate
# real crawl text); anything else passes through verbatim, still
# deterministically.
HTML_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def html_text_column(html: str = "html", charset: str = "UTF-8"):
    """The extraction expression: ``html`` binary column → text Column.

    Removal order: script blocks, style blocks, comments (so markup
    commented out inside either block form is gone either way), then
    every remaining tag → one space (a block boundary must separate
    words, never glue them); entities decode AFTER tag-stripping so a
    decoded ``&lt;`` can never be re-parsed as markup; finally all
    whitespace runs collapse to single spaces and the ends trim.
    """
    s = F.decode(F.col(html) if isinstance(html, str) else html, charset)
    for pat in (HTML_SCRIPT_RE, HTML_STYLE_RE, HTML_COMMENT_RE, HTML_TAG_RE):
        s = F.regexp_replace(s, pat, " ")
    for ent, ch in HTML_ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(s, HTML_WS_RE, " "))


def extract_html_text(
    pages: DataFrame, html: str = "html", out: str = "text", charset: str = "UTF-8"
) -> DataFrame:
    """Extract page text from the ``html:binary`` column (per-row map
    work, zero shuffles; the filter/prune-friendly first stage of an
    html-only crawl ingest — ``jobs/build_index.py --extract-html``)."""
    return pages.withColumn(out, html_text_column(html, charset))


def webpages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver-generated ``documents.parquet`` to the webpages
    input shape (S3-equivalent ingestion; extraction is the identity on
    ``text`` → byte-identical per-row invariant)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.format_string("https://docs.example.com/%s/%08d", "source", "doc_id").alias("url"),
        (F.to_timestamp(F.lit("2025-01-01 00:00:00")) + F.make_interval(secs=F.col("doc_id"))).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body>"), "text", F.lit("</body></html>")), "utf-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
