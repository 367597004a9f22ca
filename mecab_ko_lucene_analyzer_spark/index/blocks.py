"""Block-compressed posting lists with block-max metadata (I3/I4).

Input: row postings ``(term, doc_id, tf, positions, doc_len)`` (the
``build.py`` output). Output: ``blocks`` table::

    term string, first_doc long, n_docs int,
    doc_deltas binary, tfs binary, pos_deltas binary, doc_lens binary,
    block_max_tf int, block_max_impact double

``doc_lens`` (varint per doc) makes WAND scoring self-contained: the
exact BM25 impact is recomputable from (tf, doc_len, avgdl) without a
doc-stats lookup per candidate.

``block_max_impact`` is the block's max of ``tf/(tf + k1*(1-b+b*dl/avgdl))``
— the document-dependent BM25 factor — so a block's score upper bound
for WAND is ``idf(term) * block_max_impact`` (classic Block-Max WAND,
Ding & Suel 2011).

Skew handling (I4): the merge shuffle is ``repartitionByRange(term,
salt)`` where ``salt = doc_id >> SALT_SHIFT`` for *hot* terms (df above
a corpus-share threshold — in Korean web text these are exactly the
josa/particle terms the reference hardcodes,
``KoreanWordExtractor.java:62``) and 0 for the long tail. Salt ranges
are doc-contiguous, so per-salt block runs concatenate into a globally
doc-ordered posting list without any re-merge pass.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

from .build import B, K1
from .codec import BLOCK_SIZE, encode_block

__all__ = ["build_blocks", "BLOCKS_SCHEMA", "SALT_SHIFT"]

#: 2^16 docs per salt range — one hot term contributes ~512 blocks per
#: salt, and a 10^12-doc corpus spreads a ubiquitous josa term over
#: ~15M salt keys instead of 1.
SALT_SHIFT = 16

BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("first_doc", T.LongType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("doc_deltas", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        T.StructField("pos_deltas", T.BinaryType(), False),
        T.StructField("doc_lens", T.BinaryType(), False),
        T.StructField("block_max_tf", T.IntegerType(), False),
        T.StructField("block_max_impact", T.DoubleType(), False),
    ]
)


def _hot_terms(
    term_stats: DataFrame, n_docs: int, share: float, min_df: int
) -> list[str]:
    thresh = max(int(n_docs * share), min_df)
    rows = term_stats.filter(F.col("df") >= thresh).select("term").collect()
    return [r["term"] for r in rows]


def build_blocks(
    postings: DataFrame,
    term_stats: DataFrame,
    n_docs: int,
    avgdl: float,
    num_partitions: int | None = None,
    hot_share: float = 0.05,
    hot_min_df: int = 1000,
    k1: float = K1,
    b: float = B,
    block_size: int = BLOCK_SIZE,
    salt_shift: int = SALT_SHIFT,
) -> DataFrame:
    """Row postings → block postings via one salted sorted shuffle +
    per-partition NumPy encode."""
    spark = postings.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism * 2
    hot = set(_hot_terms(term_stats, n_docs, hot_share, hot_min_df))
    hot_col = F.col("term").isin(list(hot)) if hot else F.lit(False)
    salted = postings.withColumn(
        "salt",
        F.when(hot_col, F.shiftright(F.col("doc_id"), salt_shift)).otherwise(F.lit(0)),
    )
    arranged = salted.repartitionByRange(
        num_partitions, "term", "salt"
    ).sortWithinPartitions("term", "salt", "doc_id")

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # stream consecutive same-term runs; block boundaries every
        # `block_size` docs (and at partition edges, which are salt-range
        # edges for hot terms → still globally doc-ordered)
        def flush(term: str, docs, tfs, impacts, poslists, dls) -> dict:
            docs = np.asarray(docs, dtype=np.uint64)
            tfs_a = np.asarray(tfs, dtype=np.uint64)
            dd, tt, pp = encode_block(docs, tfs_a, poslists)
            from .codec import encode_varints
            return {
                "term": term,
                "first_doc": int(docs[0]),
                "n_docs": len(docs),
                "doc_deltas": dd,
                "tfs": tt,
                "pos_deltas": pp,
                "doc_lens": encode_varints(np.asarray(dls, dtype=np.uint64)),
                "block_max_tf": int(tfs_a.max()),
                "block_max_impact": float(max(impacts)),
            }

        out_rows: list[dict] = []
        cur_term = None
        docs: list[int] = []
        tfs: list[int] = []
        impacts: list[float] = []
        poslists: list[np.ndarray] = []
        dls: list[int] = []

        def close_block():
            nonlocal docs, tfs, impacts, poslists, dls
            if docs:
                out_rows.append(flush(cur_term, docs, tfs, impacts, poslists, dls))
                docs, tfs, impacts, poslists, dls = [], [], [], [], []

        for pdf in batches:
            for term, doc_id, tf, positions, doc_len in zip(
                pdf["term"], pdf["doc_id"], pdf["tf"], pdf["positions"], pdf["doc_len"]
            ):
                if term != cur_term:
                    close_block()
                    cur_term = term
                docs.append(int(doc_id))
                tfs.append(int(tf))
                impacts.append(
                    tf / (tf + k1 * (1 - b + b * doc_len / avgdl))
                )
                poslists.append(np.asarray(positions, dtype=np.uint64))
                dls.append(int(doc_len))
                if len(docs) >= block_size:
                    close_block()
            if len(out_rows) >= 256:
                yield pd.DataFrame(out_rows)
                out_rows = []
        close_block()
        if out_rows:
            yield pd.DataFrame(out_rows)

    return arranged.mapInPandas(encode, BLOCKS_SCHEMA)
