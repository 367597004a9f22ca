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

__all__ = ["synthesize_webpages", "webpages_from_documents", "generate_text", "WEBPAGES_SCHEMA"]

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
