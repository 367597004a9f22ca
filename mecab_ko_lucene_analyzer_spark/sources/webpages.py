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
    "charset_of",
    "HTML_SCRIPT_RE",
    "HTML_STYLE_RE",
    "HTML_COMMENT_RE",
    "HTML_TAG_RE",
    "HTML_WS_RE",
    "HTML_ENTITIES",
    "CHARSET_META_RE",
    "CHARSET_ALIASES",
    "CHARSET_SNIFF_BYTES",
    "HTML_NOINDEX_RE",
    "noindex_of",
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

    UTF-8 (the default) decodes LENIENTLY: real crawls always contain
    some mojibake bytes, and Spark's ``decode`` THROWS on the first
    malformed sequence — one bad page must not abort a 100 TB
    extraction job. ``make_valid_utf8(cast(binary as string))``
    replaces invalid sequences with U+FFFD, matching Python's
    ``errors="replace"`` byte-for-byte (pinned in tests), so the WARC
    transcode path and this Catalyst path render mojibake identically.
    Non-UTF-8 charsets keep the strict ``decode`` (they are only
    reachable through explicitly-labeled legacy configs).
    """
    b = F.col(html) if isinstance(html, str) else html
    if charset.replace("-", "").upper() == "UTF8":
        s = F.call_function("make_valid_utf8", b.cast("string"))
    else:
        s = F.decode(b, charset)
    for pat in (HTML_SCRIPT_RE, HTML_STYLE_RE, HTML_COMMENT_RE, HTML_TAG_RE):
        s = F.regexp_replace(s, pat, " ")
    for ent, ch in HTML_ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(s, HTML_WS_RE, " "))


# --------------------------------------------------------------------------
# Charset detection (HTML5 §13.2.3 encoding sniffing, bounded subset)
# --------------------------------------------------------------------------
# The Korean legacy web is the one place charset handling actually
# bites a CC-style corpus: pre-2010 pages are routinely EUC-KR/CP949
# with the label in the HTTP Content-Type header or a <meta> tag.
# Detection is Catalyst (pure string ops over an ASCII-safe byte view,
# so it is SQL-replicable and oracle-gated); DECODING of non-UTF-8
# pages happens in the WARC parse pass (`sources/warc.py`) because
# Spark's builtin `decode` rejects EUC-KR outside the legacy-charset
# conf and throws (rather than replaces) on malformed bytes — a
# non-starter for crawl data.
#
# Priority, per the HTML5 sniffing algorithm: BOM > transport-layer
# charset (HTTP header — WARC path only; not visible to the Catalyst
# expression) > meta prefix scan > utf-8 default. Unknown or absent
# labels fall back to the default, deterministically.

# ASCII-only (multi-byte UTF-8/EUC-KR sequences use bytes >= 0x80, so
# scanning the ISO-8859-1 byte view can never false-match); matches
# both <meta charset=X> and <meta http-equiv=... content="...;
# charset=X">. RE2-compatible for the DuckDB oracle.
CHARSET_META_RE = r"""(?i)<meta[^>]*charset\s*=\s*["']?\s*([A-Za-z0-9_][A-Za-z0-9._\-]*)"""

# label aliases -> the engine's supported canonical set. Values are
# exactly the charsets the WARC transcoder can decode; anything
# outside the map falls back to the default label.
CHARSET_ALIASES = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "us-ascii": "utf-8",  # ASCII ⊂ UTF-8
    "ascii": "utf-8",
    "euc-kr": "euc-kr",
    "euckr": "euc-kr",
    "ks_c_5601-1987": "euc-kr",
    "ks_c_5601_1987": "euc-kr",
    "ksc5601": "euc-kr",
    "korean": "euc-kr",
    "cp949": "cp949",
    "ms949": "cp949",
    "windows-949": "cp949",
    "x-windows-949": "cp949",
    "iso-8859-1": "iso-8859-1",
    "iso8859-1": "iso-8859-1",
    "latin-1": "iso-8859-1",
    "latin1": "iso-8859-1",
    "utf-16le": "utf-16le",
    "utf-16be": "utf-16be",
}

# HTML5 prescribes a 1024-byte prescan; real-world meta tags sometimes
# sit past a long <head>, so scan 4x that — still O(1) per row.
CHARSET_SNIFF_BYTES = 4096


def charset_of(
    html: str = "html",
    default: str = "utf-8",
    prefix_bytes: int = CHARSET_SNIFF_BYTES,
):
    """Detected charset label Column for an ``html:binary`` column:
    BOM sniff, then a :data:`CHARSET_META_RE` scan of the first
    ``prefix_bytes`` bytes (viewed as ISO-8859-1 — lossless, and the
    pattern is ASCII-only so the view cannot mis-match), normalized
    through :data:`CHARSET_ALIASES`; unknown/absent → ``default``.
    Zero shuffles — per-row map work at any scale."""
    b = F.col(html) if isinstance(html, str) else html
    prefix = F.decode(F.substring(b, 1, prefix_bytes), "ISO-8859-1")
    label = F.lower(F.regexp_extract(prefix, CHARSET_META_RE, 1))
    alias_map = F.create_map(
        *[F.lit(x) for kv in CHARSET_ALIASES.items() for x in kv]
    )
    from_meta = F.coalesce(F.element_at(alias_map, label), F.lit(default))
    return (
        F.when(F.substring(b, 1, 3) == F.lit(b"\xef\xbb\xbf"), F.lit("utf-8"))
        .when(F.substring(b, 1, 2) == F.lit(b"\xff\xfe"), F.lit("utf-16le"))
        .when(F.substring(b, 1, 2) == F.lit(b"\xfe\xff"), F.lit("utf-16be"))
        .otherwise(from_meta)
    )


# A robots meta directive excludes a page from the index (the crawl
# counterpart of ES's index:false): match `noindex` inside a
# <meta name=robots ...> tag, either attribute order. `[^>]*` cannot
# cross a tag boundary, so a noindex in some OTHER tag never matches.
# Approximation bound (documented): `noindex` anywhere later in the
# robots tag counts — attribute-exact parsing would need a real HTML
# parser for no practical gain on crawl data. ASCII-only and
# RE2-compatible for the DuckDB oracle.
HTML_NOINDEX_RE = (
    r"""(?i)(?:<meta[^>]*name\s*=\s*["']?robots\b[^>]*noindex"""
    r"""|<meta[^>]*noindex[^>]*name\s*=\s*["']?robots\b)"""
)


def noindex_of(html: str = "html"):
    """Boolean Column: does the page carry a robots ``noindex`` meta
    directive? Scans the full document through the lossless
    ISO-8859-1 byte view (pattern is ASCII-only, so the view cannot
    mis-match regardless of the page's real charset). NULL html is
    False — a page without bytes cannot carry a directive, and a
    three-valued NULL here would silently drop the row through
    ``filter(~noindex_of(...))``. Zero shuffles."""
    b = F.col(html) if isinstance(html, str) else html
    return F.coalesce(
        F.decode(b, "ISO-8859-1").rlike(HTML_NOINDEX_RE), F.lit(False)
    )


# first <title> element's direct text (group 1). Documented bounds:
# the FIRST title wins (regexp_extract returns the first match — the
# HTML5 tree builder likewise only honors the first in head), and
# markup nested inside the title ends the capture (the ANCHOR_RE
# convention; real titles are character data per the spec, which
# forbids markup inside <title>). ASCII-only pattern, RE2-compatible.
HTML_TITLE_RE = r"(?is)<title[^>]*>([^<]*)"


def title_of(html: str = "html", charset: str = "UTF-8"):
    """The page title as a text Column: first ``<title>`` element's
    direct text, entity-decoded with the extraction chain's ordered
    entity set, whitespace-collapsed and trimmed ('' when absent or
    empty, NULL only for NULL html). Reads the lenient UTF-8 view —
    titles are real page text (Korean included) and mojibake must not
    abort the job. Zero shuffles; the title FIELD an index build
    consumes (``build_and_write(with_titles=True)``)."""
    b = F.col(html) if isinstance(html, str) else html
    if charset.replace("-", "").upper() == "UTF8":
        s = F.call_function("make_valid_utf8", b.cast("string"))
    else:
        s = F.decode(b, charset)
    t = F.regexp_extract(s, HTML_TITLE_RE, 1)
    for ent, ch in HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, HTML_WS_RE, " "))


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
