"""Watermarked windowed crawl stats (streaming/windowed.py): window
arithmetic, batch/stream equivalence, and the watermark actually
dropping late rows in update mode."""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from mecab_ko_lucene_analyzer_spark.streaming.windowed import (
    windowed_crawl_stats,
)


def _mk(spark):
    rows = []
    for i in range(12):
        rows.append(
            (
                i,
                f"2026-01-01 {i // 2:02d}:{30 * (i % 2):02d}:00",
                "a" if i % 3 else "b",
                100 + i,
            )
        )
    df = spark.createDataFrame(
        rows, "doc_id long, ts string, source string, n_chars long"
    )
    return df.select(
        "doc_id",
        F.to_timestamp("ts").alias("crawl_ts"),
        "source",
        "n_chars",
    )


def test_batch_window_arithmetic(spark):
    docs = _mk(spark)
    out = windowed_crawl_stats(docs, window="1 hour").collect()
    got = {(r["window_start"], r["source"]): (r["doc_count"], r["sum_chars"]) for r in out}
    # brute force
    rows = docs.collect()
    want = {}
    for r in rows:
        ws = int(r["crawl_ts"].timestamp()) // 3600 * 3600
        k = (ws, r["source"])
        c, s = want.get(k, (0, 0))
        want[k] = (c + 1, s + r["n_chars"])
    assert got == want
    # two docs per hour → every window has exactly 2 rows total count
    assert sum(c for c, _ in got.values()) == 12


def test_stream_complete_equals_batch(spark):
    """availableNow file stream in complete mode == the batch run of
    the SAME function over the same rows (one definition, no
    backfill/stream drift)."""
    base = tempfile.mkdtemp(prefix="wstats_")
    try:
        docs = _mk(spark)
        docs.coalesce(1).write.mode("overwrite").parquet(f"{base}/in")
        stream = spark.readStream.schema(docs.schema).parquet(f"{base}/in")
        q = (
            windowed_crawl_stats(stream, window="1 hour")
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("wstats_t")
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{base}/ckpt")
            .start()
        )
        q.awaitTermination()
        got = {
            (r["window_start"], r["source"]): (r["doc_count"], r["sum_chars"])
            for r in spark.sql("SELECT * FROM wstats_t").collect()
        }
        want = {
            (r["window_start"], r["source"]): (r["doc_count"], r["sum_chars"])
            for r in windowed_crawl_stats(docs, window="1 hour").collect()
        }
        assert got == want
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_watermark_drops_late_rows_in_update_mode(spark):
    """A second micro-batch carrying a row older than (max event time −
    watermark) must be DROPPED: its window total never updates. This is
    the bounded-state guarantee — at crawl scale the state store holds
    only windows newer than the watermark horizon."""
    base = tempfile.mkdtemp(prefix="wlate_")
    try:
        schema = "doc_id long, crawl_ts timestamp, source string, n_chars long"

        def write(rows, mode):
            spark.createDataFrame(
                [(d, ts, s, n) for d, ts, s, n in rows],
                "doc_id long, crawl_ts string, source string, n_chars long",
            ).select(
                "doc_id",
                F.to_timestamp("crawl_ts").alias("crawl_ts"),
                "source",
                "n_chars",
            ).coalesce(1).write.mode(mode).parquet(f"{base}/in")

        # batch 1 advances event time to 10:00 → watermark 09:00
        write(
            [
                (0, "2026-01-01 06:30:00", "a", 100),
                (1, "2026-01-01 10:00:00", "a", 100),
            ],
            "overwrite",
        )
        # ONE long-lived query (the memory sink cannot recover a
        # checkpoint across restarts): drain, drop the late file,
        # drain again — watermark state carries across micro-batches
        stream = spark.readStream.schema(schema).parquet(f"{base}/in")
        q = (
            windowed_crawl_stats(stream, window="1 hour", watermark="1 hour")
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("wlate_t")
            .start()
        )
        q.processAllAvailable()
        # batch 2: one admissible row (09:30) and one LATE row (06:45,
        # before the 09:00 watermark) that must be dropped
        write(
            [
                (2, "2026-01-01 09:30:00", "a", 100),
                (3, "2026-01-01 06:45:00", "a", 999),
            ],
            "append",
        )
        q.processAllAvailable()
        q.stop()
        rows = spark.sql("SELECT * FROM wlate_t").collect()
        by_win = {}
        for r in rows:  # update mode re-emits per batch: keep last
            by_win[(r["window_start"], r["source"])] = (
                r["doc_count"],
                r["sum_chars"],
            )
        h6 = int(
            spark.sql(
                "SELECT unix_timestamp(to_timestamp('2026-01-01 06:00:00'))"
            ).first()[0]
        )
        h9 = h6 + 3 * 3600
        # the 06:00 window keeps its batch-1 state — the late doc 3
        # never lands (sum stays 100, not 1099)
        assert by_win[(h6, "a")] == (1, 100)
        assert by_win[(h9, "a")] == (1, 100)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# ------------------------------------------------------ session windows


def _smk(spark):
    # per-source event trains with designed gaps (gap = 30 min):
    #   a: 00:00, 00:10, 00:25 | 01:30, 01:40   (two sessions)
    #   b: 00:00, 00:30 (exactly the gap → still MERGES: Spark's
    #      session boundary is inclusive) | 02:00
    rows = [
        (0, "2026-01-01 00:00:00", "a", 10),
        (1, "2026-01-01 00:10:00", "a", 10),
        (2, "2026-01-01 00:25:00", "a", 10),
        (3, "2026-01-01 01:30:00", "a", 10),
        (4, "2026-01-01 01:40:00", "a", 10),
        (5, "2026-01-01 00:00:00", "b", 20),
        (6, "2026-01-01 00:30:00", "b", 20),
        (7, "2026-01-01 02:00:00", "b", 20),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, ts string, source string, n_chars long"
    )
    return df.select(
        "doc_id", F.to_timestamp("ts").alias("crawl_ts"), "source", "n_chars"
    )


def _epoch(spark, s):
    return int(
        spark.sql(f"SELECT unix_timestamp(to_timestamp('{s}'))").first()[0]
    )


def test_session_windows_batch_gap_law(spark):
    from mecab_ko_lucene_analyzer_spark.streaming.windowed import (
        session_crawl_stats,
    )

    docs = _smk(spark)
    got = {
        (r["session_start"], r["source"]): (r["doc_count"], r["sum_chars"])
        for r in session_crawl_stats(docs, gap="30 minutes").collect()
    }
    t = lambda s: _epoch(spark, s)
    assert got == {
        (t("2026-01-01 00:00:00"), "a"): (3, 30),
        (t("2026-01-01 01:30:00"), "a"): (2, 20),
        # b's 00:30 event lands EXACTLY at 00:00+gap → inclusive
        # boundary merges it into the first session
        (t("2026-01-01 00:00:00"), "b"): (2, 40),
        (t("2026-01-01 02:00:00"), "b"): (1, 20),
    }


def test_session_windows_stream_append_equals_batch(spark):
    """Streaming session windows run in APPEND mode only: a session
    row emits exactly once, when the watermark passes its end. Two
    far-future sentinel batches advance the watermark (emission uses
    the PREVIOUS batch's watermark) so every real session finalizes;
    the appended rows must equal the batch run of the same
    definition."""
    from mecab_ko_lucene_analyzer_spark.streaming.windowed import (
        session_crawl_stats,
    )

    base = tempfile.mkdtemp(prefix="sess_")
    try:
        docs = _smk(spark)
        docs.coalesce(1).write.mode("overwrite").parquet(f"{base}/in")
        stream = spark.readStream.schema(docs.schema).parquet(f"{base}/in")
        q = (
            session_crawl_stats(stream, gap="30 minutes")
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("sess_t")
            .start()
        )
        q.processAllAvailable()
        for i, day in enumerate(("02", "03")):
            spark.createDataFrame(
                [(100 + i, f"2026-01-{day} 00:00:00", "zz", 0)],
                "doc_id long, ts string, source string, n_chars long",
            ).select(
                "doc_id",
                F.to_timestamp("ts").alias("crawl_ts"),
                "source",
                "n_chars",
            ).coalesce(1).write.mode("append").parquet(f"{base}/in")
            q.processAllAvailable()
        q.stop()
        emitted = {
            (r["session_start"], r["source"]): (r["doc_count"], r["sum_chars"])
            for r in spark.sql(
                "SELECT * FROM sess_t WHERE source <> 'zz'"
            ).collect()
        }
        want = {
            (r["session_start"], r["source"]): (r["doc_count"], r["sum_chars"])
            for r in session_crawl_stats(docs, gap="30 minutes").collect()
        }
        assert emitted == want
    finally:
        shutil.rmtree(base, ignore_errors=True)
