"""Watermarked event-time window aggregation over a crawl stream.

The streaming counterpart of ``query/aggs.py::date_histogram``: a live
crawl feed (WARC fetch events, HTTP migrator pages —
``HttpMigrator.java``'s paging loop re-expressed as a file stream)
aggregated into tumbling event-time windows per source, with a
watermark bounding how late a fetch record may arrive before its
window's state is reclaimed. This is the canonical Structured
Streaming stateful-aggregation shape: window state lives in the state
store, partial aggregation happens map-side per micro-batch, and the
watermark is what makes the state BOUNDED at 10^12-doc scale — without
it every window ever seen stays resident forever.

Output modes (caller's ``writeStream``):

* ``update``/``append`` — production: late rows beyond the watermark
  are DROPPED (tested: ``tests/test_streaming_windowed.py``), closed
  windows stop updating, state is evicted.
* ``complete`` — bounded replays/backfills (the contract query): every
  window emits, which makes a finite replay exactly SQL-replicable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["windowed_crawl_stats", "session_crawl_stats"]


def windowed_crawl_stats(
    stream_docs: DataFrame,
    ts_col: str = "crawl_ts",
    key_col: str = "source",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time windows per ``key_col``: ``(window_start,
    <key_col>, doc_count, sum_chars)``; ``window_start`` is emitted as
    epoch seconds (BIGINT) so batch oracles compare with pure integer
    arithmetic (the ``date_histogram`` convention — windows align to
    the epoch origin, so ``start = ts // w * w``).

    Works on a streaming OR batch DataFrame: ``withWatermark`` is a
    no-op marker in batch mode, so the same code path backfills from
    parquet and serves live — one definition, no drift between the
    backfill and the stream (the lambda-architecture failure mode this
    avoids)."""
    return (
        stream_docs.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            F.col(key_col),
        )
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.sum(F.col("n_chars").cast("long")).alias("sum_chars"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            key_col,
            "doc_count",
            "sum_chars",
        )
    )


def session_crawl_stats(
    stream_docs: DataFrame,
    ts_col: str = "crawl_ts",
    key_col: str = "source",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based SESSION windows per ``key_col`` (``F.session_window``
    — the other Structured Streaming window family): events of one key
    merge while each arrives within ``gap`` of the previous event
    (Spark's boundary is INCLUSIVE: an event at exactly
    ``prev + gap`` still extends the session; only a strictly larger
    silence starts a new one — pinned by the tests). The shape behind
    crawl-burst detection, per-host politeness accounting, and
    user-session rollups.

    ``(session_start, <key_col>, doc_count, sum_chars)``;
    ``session_start`` is the FIRST event's epoch seconds (BIGINT — the
    engine's timestamp convention). Batch and streaming share this one
    definition; in streaming the watermark both bounds state and
    finalizes sessions, and the sink must be APPEND mode — Spark
    rejects update and complete for streaming session aggregations
    (a session emits exactly once, when the watermark passes its
    end)."""
    return (
        stream_docs.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"),
            F.col(key_col),
        )
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.sum(F.col("n_chars").cast("long")).alias("sum_chars"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            key_col,
            "doc_count",
            "sum_chars",
        )
    )
