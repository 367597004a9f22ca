"""WARC reader — Common-Crawl's container format (ISO 28500 / WARC 1.0).

The north-rule corpus is "Common-Crawl-style web pages"; CC itself
ships them as ~64k gzipped WARC archives per crawl. This source turns
``*.warc[.gz]`` archives into the engine's webpages input shape:

* **File-level parallelism** — one task streams ONE archive
  record-by-record (the parse state is a single record's headers +
  body, never the file), exactly the sharding unit CC distributes at.
  A crawl's worth of archives saturates any executor count; a single
  archive is the irreducible sequential unit because gzip members
  chain.
* **Arrow-batched emission** — records leave the parser in bounded
  chunks through ``mapInPandas`` (no per-row Python UDF, no
  whole-file materialization).
* **Pure-Python record parser** — version line, CRLF headers,
  ``Content-Length`` block, two-CRLF trailer — written against the
  public WARC 1.0 spec; HTTP response blocks are split at the header
  boundary with chunked transfer-encoding honored, so ``html`` is the
  page bytes exactly as served.

``warc_to_webpages`` composes the full ingestion story: WARC records →
:func:`~.webpages.extract_html_text` → heuristic language label →
``(url, warc_ts, html, text, lang)``, ready for ``build_and_write`` or
the streaming ingest.
"""

from __future__ import annotations

import gzip
import io
import re
from collections.abc import Iterator

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .webpages import CHARSET_ALIASES, CHARSET_META_RE, CHARSET_SNIFF_BYTES

__all__ = [
    "read_warc",
    "warc_to_webpages",
    "iter_warc_records",
    "detect_charset_bytes",
    "transcode_to_utf8",
]

_RECORDS_PER_BATCH = 1024

# the same meta pattern the Catalyst detector (`webpages.charset_of`)
# uses, compiled for the parse pass; scanned over the latin-1 byte view
# (pattern is ASCII-only, so the view cannot mis-match).
_META_RE = re.compile(CHARSET_META_RE)
_HEADER_CHARSET_RE = re.compile(
    r"""(?i)charset\s*=\s*["']?\s*([A-Za-z0-9_][A-Za-z0-9._\-]*)"""
)

# canonical label -> Python codec name (the canonical set is defined by
# CHARSET_ALIASES' value set; this table must cover exactly it)
_PY_CODECS = {
    "utf-8": "utf-8",
    "euc-kr": "euc_kr",
    "cp949": "cp949",
    "iso-8859-1": "latin-1",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
}


def detect_charset_bytes(
    body: bytes, content_type: str | None = None, default: str = "utf-8"
) -> str:
    """Charset label for raw page bytes — the Python twin of the
    Catalyst :func:`~.webpages.charset_of` expression, with the one
    extra signal only this path can see: the transport-layer charset
    from the HTTP ``Content-Type`` header. Priority per HTML5
    sniffing: BOM > transport > meta prefix scan > ``default``.
    Pure function of its arguments (same answer on every executor,
    every retry)."""
    if body.startswith(b"\xef\xbb\xbf"):
        return "utf-8"
    if body.startswith(b"\xff\xfe"):
        return "utf-16le"
    if body.startswith(b"\xfe\xff"):
        return "utf-16be"
    if content_type:
        m = _HEADER_CHARSET_RE.search(content_type)
        if m:
            cs = CHARSET_ALIASES.get(m.group(1).lower())
            if cs:
                return cs
    m = _META_RE.search(body[:CHARSET_SNIFF_BYTES].decode("latin-1"))
    if m:
        cs = CHARSET_ALIASES.get(m.group(1).lower())
        if cs:
            return cs
    return default


def transcode_to_utf8(
    body: bytes, content_type: str | None = None
) -> tuple[bytes, str]:
    """``(utf-8 page bytes, detected source charset)``. Non-UTF-8
    pages decode with ``errors="replace"`` (a crawl ingester must not
    throw away a page over one mojibake byte — U+FFFD is the
    deterministic rendering); a leading BOM is stripped either way so
    it can never leak into extracted text."""
    cs = detect_charset_bytes(body, content_type)
    if cs == "utf-8":
        return (body[3:] if body.startswith(b"\xef\xbb\xbf") else body), cs
    decoded = body.decode(_PY_CODECS[cs], errors="replace").lstrip("\ufeff")
    return decoded.encode("utf-8"), cs


def iter_warc_records(stream) -> Iterator[tuple[dict, bytes]]:
    """Yield ``(headers, block)`` per record from a binary stream of a
    WARC 1.0 file. Header names are lower-cased; the block is the raw
    Content-Length payload (for ``response`` records: status line +
    HTTP headers + body). Bounded memory: one record at a time."""
    while True:
        line = stream.readline()
        if not line:
            return
        if not line.strip():  # inter-record CRLF padding
            continue
        if not line.startswith(b"WARC/"):
            raise ValueError(f"expected WARC version line, got {line[:40]!r}")
        headers: dict[str, str] = {}
        while True:
            h = stream.readline()
            if not h or not h.strip():
                break
            name, _, value = h.decode("latin-1").partition(":")
            headers[name.strip().lower()] = value.strip()
        length = int(headers.get("content-length", "0"))
        block = stream.read(length)
        if len(block) < length:
            raise ValueError("truncated WARC record block")
        yield headers, block


def _dechunk(body: bytes) -> bytes:
    """Decode HTTP/1.1 chunked transfer-encoding (hex-size line, chunk,
    CRLF, ... until the 0 chunk). Malformed framing degrades to the raw
    bytes — a crawl reader must not throw away a page over one bad
    chunk header."""
    out, pos = [], 0
    while True:
        nl = body.find(b"\r\n", pos)
        if nl < 0:
            return body  # not actually chunked framing
        size_token = body[pos:nl].split(b";", 1)[0].strip()
        try:
            size = int(size_token, 16)
        except ValueError:
            return body
        if size == 0:
            break
        start = nl + 2
        out.append(body[start : start + size])
        pos = start + size + 2  # skip chunk CRLF
    return b"".join(out)


def _http_payload(block: bytes) -> tuple[bytes, str | None, bool]:
    """``(page bytes, Content-Type value, X-Robots-Tag noindex?)``
    from an HTTP response block: drop the status line + headers,
    de-chunk if the response was chunked. The Content-Type line feeds
    charset detection (transport layer outranks the meta prescan);
    an ``X-Robots-Tag`` header carrying ``noindex`` (any directive
    list, any bot scope) is the transport-level twin of the robots
    meta tag (`webpages.noindex_of`)."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        return block, None, False
    head = block[:sep].decode("latin-1", errors="replace").lower()
    body = block[sep + 4 :]
    content_type = None
    if "content-type:" in head:
        content_type = (
            head.split("content-type:", 1)[1].split("\r\n", 1)[0].strip()
        )
    hdr_noindex = (
        "x-robots-tag:" in head
        and "noindex" in head.split("x-robots-tag:", 1)[1].split("\r\n", 1)[0]
    )
    if "transfer-encoding:" in head and "chunked" in head.split(
        "transfer-encoding:", 1
    )[1].split("\r\n", 1)[0]:
        return _dechunk(body), content_type, hdr_noindex
    return body, content_type, hdr_noindex


def _open_stream(path: str):
    """Open ``path`` for sequential binary reading on an executor.
    Local paths / ``file://`` use the builtin; other schemes go through
    ``pyarrow.fs`` (s3/hdfs/gcs as built). ``.gz`` wraps in GzipFile —
    multi-member archives (CC's per-record gzip) read transparently."""
    if path.startswith("file:"):
        raw = open(path[len("file://") :] if path.startswith("file://") else path[5:], "rb")
    elif "://" in path:
        from pyarrow import fs as pafs

        filesystem, p = pafs.FileSystem.from_uri(path)
        raw = io.BufferedReader(filesystem.open_input_stream(p))
    else:
        raw = open(path, "rb")
    if path.endswith(".gz"):
        return gzip.GzipFile(fileobj=raw)
    return raw


def _expand_paths(spark: SparkSession, paths: str | list[str]) -> list[str]:
    """Driver-side glob through the Hadoop FileSystem API (any scheme —
    the same contract the incremental doc-base state uses)."""
    if isinstance(paths, (list, tuple)):
        return list(paths)
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(paths)
    fs = jpath.getFileSystem(hconf)
    statuses = fs.globStatus(jpath)
    if statuses is None:
        return []
    out = []
    for st in statuses:
        if st.isDirectory():
            for sub in fs.listStatus(st.getPath()):
                if sub.isFile():
                    out.append(sub.getPath().toString())
        else:
            out.append(st.getPath().toString())
    return sorted(out)


def read_warc(
    spark: SparkSession,
    paths: str | list[str],
    record_types: tuple[str, ...] = ("response",),
    transcode: bool = False,
) -> DataFrame:
    """``(url, warc_ts, html, charset)`` from WARC archives — one task
    per archive, records streamed in bounded Arrow batches.

    ``charset`` is the detected source charset
    (:func:`detect_charset_bytes`: BOM > HTTP Content-Type > meta
    prescan); ``hdr_noindex`` is the transport-level robots signal
    (``X-Robots-Tag`` header carrying ``noindex`` — the meta-tag
    level is `webpages.noindex_of` over ``html``). With
    ``transcode=False`` (default) ``html`` is the page bytes exactly
    as served; ``transcode=True`` re-encodes non-UTF-8 pages to UTF-8
    in the same parse pass (no extra Python boundary) so downstream
    Catalyst extraction needs only one decode charset — the
    legacy-Korean-web (EUC-KR/CP949) ingestion path."""
    expanded = _expand_paths(spark, paths)
    if not expanded:
        raise FileNotFoundError(f"no WARC files match {paths!r}")
    wanted = {t.lower() for t in record_types}

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path in pdf["path"]:
                stream = _open_stream(path)
                try:
                    urls, tss, payloads, charsets, noidx = [], [], [], [], []
                    for headers, block in iter_warc_records(stream):
                        if headers.get("warc-type", "").lower() not in wanted:
                            continue
                        body, ctype, hdr_noindex = _http_payload(block)
                        if transcode:
                            body, cs = transcode_to_utf8(body, ctype)
                        else:
                            cs = detect_charset_bytes(body, ctype)
                        urls.append(headers.get("warc-target-uri"))
                        tss.append(headers.get("warc-date"))
                        payloads.append(body)
                        charsets.append(cs)
                        noidx.append(hdr_noindex)
                        if len(urls) >= _RECORDS_PER_BATCH:
                            yield _to_frame(urls, tss, payloads, charsets, noidx)
                            urls, tss, payloads, charsets, noidx = (
                                [], [], [], [], [],
                            )
                    if urls:
                        yield _to_frame(urls, tss, payloads, charsets, noidx)
                finally:
                    stream.close()

    def _to_frame(urls, tss, payloads, charsets, noidx):
        ts = pd.to_datetime(pd.Series(tss), utc=True, errors="coerce")
        return pd.DataFrame(
            {
                "url": urls,
                "warc_ts": ts.dt.tz_localize(None),
                "html": payloads,
                "charset": charsets,
                "hdr_noindex": noidx,
            }
        )

    paths_df = spark.createDataFrame(
        [(p,) for p in expanded], "path string"
    ).repartition(len(expanded))
    return paths_df.mapInPandas(
        parse,
        "url string, warc_ts timestamp, html binary, charset string, "
        "hdr_noindex boolean",
    )


def warc_to_webpages(
    spark: SparkSession,
    paths: str | list[str],
    respect_noindex: bool = False,
) -> DataFrame:
    """Full ingestion composition: WARC archives → charset-normalized
    page bytes → extracted text + heuristic language label in the
    engine's ``(url, warc_ts, html, text, lang)`` input shape
    (Catalyst extraction + labeling on top of the streamed records —
    the Python boundary stays one parser pass). Legacy EUC-KR/CP949
    pages arrive transcoded to UTF-8, so one extraction charset
    serves the whole crawl; the detected source charset is dropped
    here to keep the pinned input shape (use :func:`read_warc`
    directly for charset lineage). ``respect_noindex=True`` drops
    pages excluded by EITHER robots channel — the ``X-Robots-Tag``
    header (transport) or the robots meta tag — before they reach the
    analysis chain."""
    from ..functions.text import predicted_lang
    from .webpages import html_text_column, noindex_of

    pages = read_warc(spark, paths, transcode=True)
    if respect_noindex:
        pages = pages.filter(~(F.col("hdr_noindex") | noindex_of("html")))
    return (
        pages.withColumn("text", html_text_column("html"))
        .withColumn("lang", predicted_lang(F.col("text")))
        .drop("charset", "hdr_noindex")
    )
