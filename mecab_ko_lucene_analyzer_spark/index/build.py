"""Inverted-index construction (I1–I5) — the stage the reference hands
to Lucene (``DanawaBulkTextIndexer.java:106`` → ES shard indexing); here
it is a native Spark plan.

Plan discipline (the part that must survive 100×):

* tokenization (the expensive Arrow UDF) happens **exactly once**: every
  derived table (term/doc/corpus stats) is computed *from the postings
  relation*, never from a second scan of the corpus. ``doc_len`` is
  ``sum(tf)`` over a doc's postings — identical to the token count.
* the corpus is pruned to ``(url, text)`` before the docID range
  shuffle, so page ``html`` bytes never cross the wire.
* one wide exchange builds postings (``groupBy(term, doc_id)`` with
  map-side partial aggregation); stats reuse that output.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.udfs import tokens_table
from .docids import assign_doc_ids

__all__ = [
    "InvertedIndex",
    "build_index",
    "build_and_write",
    "load_index",
    "corpus_tokens",
]

K1 = 1.2
B = 0.75


def corpus_tokens(
    pages: DataFrame,
    lang_filter: str | None = "ko",
    mode: str = "standard",
    compound_noun_min_length: int = 3,
    num_partitions: int | None = None,
):
    """Corpus → ``(tokens, doc_map)`` in ONE Python pass.

    Fuses docID assignment (I1) and tokenization (A1–A10/I2) into a
    single ``mapInPandas`` over the range-partitioned corpus: the text
    crosses the Arrow boundary once, and no intermediate docID-stamped
    corpus is materialized. ``tokens`` carries ``doc_len`` so the
    block encoder never joins back to doc stats.

    Returns ``(tokens_df, doc_map_df)`` where ``doc_map`` is
    ``(doc_id, url)`` (resolution table for query results), both reading
    the same persisted shuffle.
    """
    import pandas as pd
    import pyspark.sql.types as T
    from pyspark import StorageLevel

    from ..analysis.tokenizer import get_lattice_provider, tokenize

    spark = pages.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    if lang_filter is not None:
        pages = pages.filter(F.col("lang") == lang_filter)
    pruned = pages.select("url", "text")
    parts = (
        pruned.repartitionByRange(num_partitions, "url")
        .sortWithinPartitions("url")
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in parts.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    tokens_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("term", T.StringType(), False),
            T.StructField("type", T.StringType(), False),
            T.StructField("position", T.IntegerType(), False),
            T.StructField("start_offset", T.IntegerType(), False),
            T.StructField("end_offset", T.IntegerType(), False),
            T.StructField("doc_len", T.IntegerType(), False),
        ]
    )

    def emit_tokens(batches):
        provider = get_lattice_provider()
        seen = 0
        base = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = offsets[int(pdf["_pid"].iloc[0])]
            doc_ids, terms, types, positions, starts, ends, doc_lens = (
                [], [], [], [], [], [], [],
            )
            for off, txt in enumerate(pdf["text"]):
                d = base + seen + off
                toks = tokenize(
                    txt or "", mode, compound_noun_min_length, provider=provider
                )
                position = -1
                for p in toks:
                    position += p.position_incr
                    doc_ids.append(d)
                    terms.append(p.token_string())
                    types.append(p.pos_id.name)
                    positions.append(position)
                    starts.append(p.start_offset)
                    ends.append(p.end_offset)
                doc_lens.extend([len(toks)] * len(toks))
            seen += len(pdf)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "term": terms,
                    "type": types,
                    "position": pd.Series(positions, dtype="int32"),
                    "start_offset": pd.Series(starts, dtype="int32"),
                    "end_offset": pd.Series(ends, dtype="int32"),
                    "doc_len": pd.Series(doc_lens, dtype="int32"),
                }
            )

    map_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("url", T.StringType(), False),
        ]
    )

    def emit_map(batches):
        seen = 0
        base = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = offsets[int(pdf["_pid"].iloc[0])]
            ids = range(base + seen, base + seen + len(pdf))
            seen += len(pdf)
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"), "url": pdf["url"].values}
            )

    return parts.mapInPandas(emit_tokens, tokens_schema), parts.mapInPandas(
        emit_map, map_schema
    )


def _rows_stable_across_jobs(df: DataFrame) -> bool:
    """True when ``df``'s optimized plan is a deterministic scan —
    file/local relations under projections and filters only. Such plans
    enumerate the same rows in the same per-partition order in every
    job (file-split planning depends on file sizes + conf; local rows
    are literals), which is what lets the unordered docID path run its
    three passes (count, text, url) as independent jobs. Anything with
    an upstream shuffle, join, aggregate, generator, or sample can
    reorder rows between jobs — callers must materialize once
    instead."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:
        return False
    allowed = ("Relation", "LocalRelation", "Project", "Filter")
    for line in plan.splitlines():
        name = line.strip().lstrip("+-: ").split(" ", 1)[0].split("[", 1)[0]
        if name == "InMemoryRelation":
            # a cache IS a single shared materialization; the lines
            # below it describe the plan that fills it, not what the
            # passes re-execute. Any combiner above a cache (join,
            # union) fails the allowlist before this line is reached.
            return True
        if name and name not in allowed:
            return False
    return True


def corpus_postings(
    pages: DataFrame,
    lang_filter: str | None = "ko",
    mode: str = "standard",
    compound_noun_min_length: int = 3,
    num_partitions: int | None = None,
    order: str = "input",
):
    """Corpus → ``(postings, doc_map)`` with ZERO token-level shuffle.

    A document's tokens never leave their partition, so the
    ``(term, doc_id)`` aggregation is partition-local by construction —
    the emitter aggregates tf/positions per doc in Python and emits
    posting rows directly. The only wide exchange in the whole index
    build is the salted term repartition of the block stage (I4),
    exactly the shuffle the format needs.

    docID order (both dense + deterministic, I1):

    * ``order="input"`` (default): docID = global rank in (input split,
      row) order. For an immutable table snapshot the file listing and
      row order are stable, so ids are reproducible across runs/retries
      — and the count pass is a *narrow* job: at 10^12-doc scale no
      byte of the corpus ever crosses the network before the term
      shuffle.
    * ``order="url"``: docID = global rank of ``url`` (canonical order,
      partition-count independent) via one range shuffle of the pruned
      corpus, persisted so both passes share it.

    Returns ``(postings, doc_map, n_docs, counters)`` — the doc count
    falls out of the docID offset pass, and ``counters`` is a pair of
    Spark accumulators ``(total_tokens, postings_rows)`` updated inside
    the tokenize ``mapInPandas``. Accumulator updates in a
    TRANSFORMATION can replay under task retries / speculation, so
    these are informational lineage counters only — anything that feeds
    scoring (avgdl → block_max_impact → BM25) is derived retry-exactly
    from the written doc_stats via ``Observation`` in the stats stage.
    """
    import pandas as pd
    import pyspark.sql.types as T
    from pyspark import StorageLevel

    from ..analysis.tokenizer import (
        get_lattice_provider,
        index_token_stream,
        tokenize,
    )

    spark = pages.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    if lang_filter is not None:
        pages = pages.filter(F.col("lang") == lang_filter)
    pruned = pages.select("url", "text")
    if order == "url":
        parts = (
            pruned.repartitionByRange(num_partitions, "url")
            .sortWithinPartitions("url")
            .withColumn("_pid", F.spark_partition_id())
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        text_parts = map_parts = parts  # both passes hit the one cache
    else:
        # mapInPandas carries EVERY input column across Arrow (no
        # pruning through a Python map), so give each pass only what it
        # reads: the tokenize pass never touches url, the doc_map pass
        # never touches text (~95% of the scan bytes). File-split
        # planning depends on file sizes + conf only — identical for
        # both frames — so _pid and per-partition row order agree.
        # That identity only holds for deterministic scans: an input
        # with an upstream shuffle/aggregate could enumerate rows
        # differently per job and silently mismatch postings vs
        # doc_map docIDs — those inputs are materialized ONCE and all
        # three passes read the one cache (column pruning still
        # applies against InMemoryRelation).
        if not _rows_stable_across_jobs(pruned):
            pruned = pruned.persist(StorageLevel.MEMORY_AND_DISK)
        parts = pruned.withColumn("_pid", F.spark_partition_id())
        text_parts = pruned.select("text").withColumn("_pid", F.spark_partition_id())
        map_parts = pruned.select("url").withColumn("_pid", F.spark_partition_id())
    counts = {
        r["_pid"]: r["cnt"]
        for r in parts.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    postings_schema = T.StructType(
        [
            T.StructField("term", T.StringType(), False),
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("tf", T.IntegerType(), False),
            # per-doc positions as delta+varint bytes: ~2 bytes/posting
            # through the term shuffle instead of a 12+ byte array slot,
            # and block encoding becomes pure byte concatenation
            T.StructField("positions", T.BinaryType(), False),
            T.StructField("doc_len", T.IntegerType(), False),
        ]
    )

    acc_tokens = spark.sparkContext.accumulator(0)
    acc_postings = spark.sparkContext.accumulator(0)

    def emit_postings(batches):
        from .codec import encode_varint_groups

        provider = get_lattice_provider()
        seen = 0
        base = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = offsets[int(pdf["_pid"].iloc[0])]
            terms: list[str] = []
            doc_ids: list[int] = []
            tfs: list[int] = []
            doc_lens: list[int] = []
            flat_deltas: list[int] = []  # all position deltas, batch-wide
            for off, txt in enumerate(pdf["text"]):
                d = base + seen + off
                # flat cached stream — no per-occurrence Pos objects
                # (the build is allocator-bandwidth-bound without this)
                t_terms, t_incrs = index_token_stream(
                    txt or "", mode, compound_noun_min_length, provider
                )
                per_term: dict[str, list[int]] = {}
                position = -1
                for term_s, inc in zip(t_terms, t_incrs):
                    position += inc
                    per_term.setdefault(term_s, []).append(position)
                dl = len(t_terms)
                for term, plist in per_term.items():
                    terms.append(term)
                    doc_ids.append(d)
                    tfs.append(len(plist))
                    doc_lens.append(dl)
                    prev = 0
                    for q in plist:
                        flat_deltas.append(q - prev)
                        prev = q
            # ONE vectorized varint pass for the whole batch
            positions = encode_varint_groups(flat_deltas, tfs)
            seen += len(pdf)
            acc_tokens.add(len(flat_deltas))
            acc_postings.add(len(terms))
            yield pd.DataFrame(
                {
                    "term": terms,
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "tf": pd.Series(tfs, dtype="int32"),
                    "positions": positions,
                    "doc_len": pd.Series(doc_lens, dtype="int32"),
                }
            )

    map_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("url", T.StringType(), False),
        ]
    )

    def emit_map(batches):
        seen = 0
        base = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = offsets[int(pdf["_pid"].iloc[0])]
            ids = range(base + seen, base + seen + len(pdf))
            seen += len(pdf)
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"), "url": pdf["url"].values}
            )

    return (
        text_parts.mapInPandas(emit_postings, postings_schema),
        map_parts.mapInPandas(emit_map, map_schema),
        acc,
        (acc_tokens, acc_postings),
    )


def _write_corpus_stats(spark, path: str, n_docs: int, avgdl: float) -> None:
    """corpus_stats is ONE row, but a Spark write is a full job
    (scheduling + task launch + commit protocol ≈ 0.5 s of pure fixed
    cost per build). Write the parquet driver-side via pyarrow for
    local/file paths; object-store paths fall back to the Spark writer
    (the extra job is noise next to remote IO there)."""
    import os
    import shutil as _shutil

    local = not ("://" in path and not path.startswith("file://"))
    if local:
        try:
            import pyarrow as pa
            import pyarrow.parquet as pq

            p = path[len("file://"):] if path.startswith("file://") else path
            _shutil.rmtree(p, ignore_errors=True)  # overwrite semantics
            os.makedirs(p, exist_ok=True)
            pq.write_table(
                pa.table(
                    {
                        "n_docs": pa.array([int(n_docs)], pa.int64()),
                        "avgdl": pa.array([float(avgdl)], pa.float64()),
                    }
                ),
                os.path.join(p, "part-00000.parquet"),
            )
            open(os.path.join(p, "_SUCCESS"), "w").close()
            return
        except ImportError:  # pragma: no cover
            pass
    spark.createDataFrame(
        [(int(n_docs), float(avgdl))], "n_docs long, avgdl double"
    ).write.mode("overwrite").parquet(path)


def _stats_from_postings(postings: DataFrame):
    term_stats = postings.groupBy("term").agg(F.count("*").alias("df"))
    if "doc_len" in postings.columns:
        # doc_len is denormalized onto every posting row → the per-doc
        # "aggregation" is a partial-agg first(): the exchange carries
        # ~1 row/doc. (A zero-shuffle mapInPandas dedup was considered
        # and rejected: a parquet file bigger than maxPartitionBytes
        # splits mid-document and would double-count — not 100×-safe.)
        doc_stats = postings.groupBy("doc_id").agg(
            F.first("doc_len").cast("long").alias("doc_len")
        )
    else:
        doc_stats = postings.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    corpus_stats = doc_stats.agg(
        F.count("*").alias("n_docs"), F.avg("doc_len").alias("avgdl")
    )
    return term_stats, doc_stats, corpus_stats


@dataclass
class InvertedIndex:
    """The queryable index: four DataFrames (≙ Iceberg tables)."""

    postings: DataFrame  # term, doc_id, tf, positions array<int>
    term_stats: DataFrame  # term, df
    doc_stats: DataFrame  # doc_id, doc_len
    corpus_stats: DataFrame  # n_docs, avgdl

    def cache(self) -> "InvertedIndex":
        # caching postings makes the derived stats single-pass too
        self.postings.cache()
        for df in (self.term_stats, self.doc_stats, self.corpus_stats):
            df.cache()
        return self


def build_index(
    pages: DataFrame,
    mode: str = "standard",
    compound_noun_min_length: int = 3,
    lang_filter: str | None = "ko",
    with_doc_ids: bool = True,
) -> InvertedIndex:
    """webpages → inverted index (lazy: call ``.cache()`` or use
    :func:`build_and_write` to avoid recomputing tokenization when more
    than one member table is consumed)."""
    if not with_doc_ids and "doc_id" in pages.columns:
        docs = pages if lang_filter is None else pages.filter(F.col("lang") == lang_filter)
        tokens = tokens_table(docs, "doc_id", "text", mode, compound_noun_min_length)
        from ..functions.udfs import encode_positions_udf

        postings = tokens.groupBy("term", "doc_id").agg(
            F.count("*").alias("tf"),
            F.sort_array(F.collect_list("position")).alias("positions_arr"),
        ).withColumn(
            "positions", encode_positions_udf()(F.col("positions_arr"))
        ).drop("positions_arr")
    else:
        postings, _, _, _ = corpus_postings(
            pages, lang_filter, mode, compound_noun_min_length
        )
    return InvertedIndex(postings, *_stats_from_postings(postings))


def build_and_write(
    pages: DataFrame,
    base_path: str,
    mode: str = "standard",
    compound_noun_min_length: int = 3,
    lang_filter: str | None = "ko",
    with_blocks: bool = False,
    hot_min_df: int = 1000,
    salt_shift: int | None = None,
    doc_order: str = "input",
) -> InvertedIndex:
    """Materialize the index with per-stage checkpoints (I6):

    1. ``postings``  — ONE tokenize + shuffle pass (+ ``doc_map``)
    2. ``stats``     — derived from the written postings
    3. ``blocks``    — salted sorted shuffle → compressed block postings

    A rerun skips completed stages (manifest + ``_SUCCESS``); docIDs are
    deterministic, so resumed output is byte-identical.
    """
    from contextlib import contextmanager

    from .manifest import BuildManifest, run_stage

    spark = pages.sparkSession

    @contextmanager
    def _build_confs():
        """Size scans and Arrow batches to the build's row shapes for
        the duration of every stage action:

        * 16384-row Arrow batches — the session default (2048, sized
          for page-text rows) quadruples Python-crossing overhead on
          the narrow posting/partial rows; measured 3× on the pack
          stage.
        * 4MB scan splits + 256KB open cost — Spark's bytes-per-core
          targeting yields ~1 split per core, so every stage runs one
          task wave and a single straggler stretches the whole stage
          (and the postings table inherits that coarse file layout,
          capping downstream parallelism). ~4 waves of small tasks
          smooth stragglers at any core count; override per deployment
          via SPARK_GRAFT_MAX_PARTITION_BYTES when input files are
          large enough that Spark's own targeting is already fine.
        """
        import os as _os

        overrides = {
            "spark.sql.execution.arrow.maxRecordsPerBatch": "16384",
            "spark.sql.files.maxPartitionBytes": _os.environ.get(
                "SPARK_GRAFT_MAX_PARTITION_BYTES", str(4 * 1024 * 1024)
            ),
            "spark.sql.files.openCostInBytes": str(256 * 1024),
        }
        saved = {}
        for key, val in overrides.items():
            try:
                saved[key] = spark.conf.get(key)
            except Exception:
                saved[key] = None
            spark.conf.set(key, val)
        try:
            yield
        finally:
            for key, val in saved.items():
                if val is None:
                    spark.conf.unset(key)
                else:
                    spark.conf.set(key, val)

    manifest = BuildManifest.load_or_create(
        base_path,
        {
            "mode": mode,
            "compound_noun_min_length": compound_noun_min_length,
            "lang_filter": lang_filter,
            "doc_order": doc_order,
            "k1": K1,
            "b": B,
        },
    )

    def stage_postings():
        import threading

        postings, doc_map, n_docs, (acc_tokens, acc_postings) = corpus_postings(
            pages, lang_filter, mode, compound_noun_min_length, order=doc_order
        )
        # doc_map is independent of the postings sink — submit it
        # concurrently so its (url-pruned, Python-thin) job fills task
        # slots the tokenize pass leaves idle in its tail, instead of
        # paying a second full job latency serially
        map_err: list[BaseException] = []

        def _write_map():
            try:
                doc_map.write.mode("overwrite").parquet(f"{base_path}/doc_map")
            except BaseException as e:  # re-raised on the main thread
                map_err.append(e)

        t = threading.Thread(target=_write_map, daemon=True)
        t.start()
        postings.write.mode("overwrite").parquet(f"{base_path}/postings")
        t.join()
        if map_err:
            raise map_err[0]
        # docs_tokenized falls out of the docID offset pass (exact);
        # token/posting totals are transformation-side accumulators —
        # informational lineage only (may over-count on task retries;
        # scoring-grade corpus stats come from the stats stage)
        return {
            "docs_tokenized": n_docs,
            "tokens_total": acc_tokens.value,
            "postings_emitted": acc_postings.value,
        }

    with _build_confs():
        run_stage(manifest, "postings", f"{base_path}/postings", stage_postings)

    def stage_stats():
        import threading

        from pyspark.sql import Observation

        postings = spark.read.parquet(f"{base_path}/postings")
        term_stats, doc_stats, _ = _stats_from_postings(postings)
        # corpus stats ride the doc_stats write via Observation — exact
        # under task retries / speculation (observed metrics are action-
        # consistent), unlike transformation-side accumulators which
        # double-count replayed batches; avgdl feeds block_max_impact
        # and BM25, so it must be retry-exact. Zero extra pass.
        obs = Observation("corpus")
        doc_stats = doc_stats.observe(
            obs,
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_len").alias("dl_sum"),
        )
        # the two aggregations are independent — overlap their job
        # latencies instead of paying them back-to-back
        ts_err: list[BaseException] = []

        def _write_terms():
            try:
                term_stats.write.mode("overwrite").parquet(f"{base_path}/term_stats")
            except BaseException as e:
                ts_err.append(e)

        t = threading.Thread(target=_write_terms, daemon=True)
        t.start()
        doc_stats.write.mode("overwrite").parquet(f"{base_path}/doc_stats")
        vals = obs.get
        n_docs = int(vals["n_docs"])
        avgdl = (vals["dl_sum"] or 0) / n_docs if n_docs else 0.0
        t.join()
        if ts_err:
            raise ts_err[0]
        _write_corpus_stats(spark, f"{base_path}/corpus_stats", n_docs, avgdl)
        return {"n_docs": n_docs, "avgdl": avgdl}

    with _build_confs():
        run_stage(manifest, "stats", f"{base_path}/term_stats", stage_stats)

    if with_blocks:

        def stage_blocks():
            from .blocks import SALT_SHIFT, build_blocks

            postings = spark.read.parquet(f"{base_path}/postings")
            term_stats = spark.read.parquet(f"{base_path}/term_stats")
            # corpus stats come from the stats stage's manifest counters
            # (present even on resume); parquet is the fallback for
            # manifests written before these counters existed
            st = manifest.stages.get("stats", {}).get("counters", {})
            if "n_docs" in st and "avgdl" in st:
                n_docs, avgdl = st["n_docs"], st["avgdl"]
            else:
                corpus = spark.read.parquet(f"{base_path}/corpus_stats").first()
                n_docs, avgdl = corpus["n_docs"], corpus["avgdl"]

            blocks = build_blocks(
                postings,
                term_stats,
                n_docs=n_docs,
                avgdl=avgdl,
                hot_min_df=hot_min_df,
                salt_shift=salt_shift if salt_shift is not None else SALT_SHIFT,
            )
            try:
                # block rows leave the re-blocker (term, first_doc)-
                # sorted within partitions, so parquet row-group min/max
                # stats prune term-filtered scans
                blocks.write.mode("overwrite").parquet(f"{base_path}/blocks")
            finally:
                partials = getattr(blocks, "_partials_df", None)
                if partials is not None:
                    partials.unpersist()
            # footer-only count (metadata scan) for the lineage counter
            return {
                "blocks_written": spark.read.parquet(f"{base_path}/blocks").count()
            }

        with _build_confs():
            run_stage(manifest, "blocks", f"{base_path}/blocks", stage_blocks)

    return load_index(spark, base_path)


def load_index(spark: SparkSession, base_path: str) -> InvertedIndex:
    """Load an index from a build directory (parquet) or a published
    Iceberg catalog namespace (dotted identifier, see
    ``sources/catalog.py::publish_index``)."""
    from ..sources.catalog import is_catalog_identifier

    sep = "." if is_catalog_identifier(base_path) else "/"
    read = (
        spark.read.table
        if sep == "."
        else spark.read.parquet
    )
    return InvertedIndex(
        read(f"{base_path}{sep}postings"),
        read(f"{base_path}{sep}term_stats"),
        read(f"{base_path}{sep}doc_stats"),
        read(f"{base_path}{sep}corpus_stats"),
    )
