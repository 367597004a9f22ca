"""Bulk top-k retrieval: thousands of queries in ONE Spark job.

The reference serves one query per REST call
(``ProductNameAnalysisAction.java:74-229``); a training-data pipeline
(hard-negative mining, relevance distillation, eval sweeps) needs the
opposite shape — a DataFrame of queries scored against the index in a
single job. Plan:

1. ONE term-pruned scan of the block index covering the whole query
   batch's vocabulary (same fetch the serving path uses; query-set
   vocabularies are small relative to the index — that is what makes
   the broadcast feasible),
2. broadcast the per-term block payloads to the executors,
3. ``mapInPandas`` over the queries table — each executor runs the
   SAME block-max WAND the serving path runs (rank-identical by
   construction), embarrassingly parallel per query.

At 10^12-doc scale the broadcast holds only the batch's query-term
postings (block-compressed, ~2 bytes/posting); for query batches whose
vocabulary postings exceed executor memory, shard the query batch by
vocabulary (disjoint term groups) and run one job per shard.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

from .bm25 import lucene_idf
from .wand import TermCursor, _Block, fetch_term_blocks, wand_topk

__all__ = ["wand_topk_batch", "ast_topk_batch"]

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType(), False),
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)


def wand_topk_batch(
    blocks: DataFrame,
    queries: DataFrame,
    n_docs: int,
    avgdl: float,
    k: int = 10,
    terms_col: str = "terms",
    id_col: str = "query_id",
) -> DataFrame:
    """Score every query row (``query_id``, ``terms array<string>``)
    against the block index; returns (query_id, rank, doc_id, score),
    rank-identical to the serving path's :func:`wand_topk` per query."""
    spark = blocks.sparkSession
    vocab = sorted(
        {
            t
            for r in queries.select(
                F.explode_outer(terms_col).alias("t")
            ).distinct().collect()
            if (t := r["t"]) is not None
        }
    )
    by_term = fetch_term_blocks(blocks, vocab)  # one pruned scan
    # ship plain tuples, not _Block objects (smaller + no class pickle)
    payload = {
        t: ([(b.first_doc, b.doc_deltas, b.tfs, b.doc_lens, b.max_impact)
             for b in blks], df)
        for t, (blks, df) in by_term.items()
    }
    bc = spark.sparkContext.broadcast((payload, n_docs, avgdl, k))

    def score(batches: Iterator) -> Iterator:
        import pandas as pd

        term_payload, n, adl, kk = bc.value
        for pdf in batches:
            qids, ranks, docs, scores = [], [], [], []
            for qid, terms in zip(pdf[id_col], pdf[terms_col]):
                cursors = []
                for t in set(terms):
                    entry = term_payload.get(t)
                    if entry is None or entry[1] == 0:
                        continue
                    blks = [
                        _Block(fd, bytes(dd), bytes(tf), bytes(dl), mi)
                        for fd, dd, tf, dl, mi in entry[0]
                    ]
                    cursors.append(
                        TermCursor(
                            term=t,
                            idf=lucene_idf(n, entry[1]),
                            blocks=blks,
                            avgdl=adl,
                        )
                    )
                for rank, (d, s) in enumerate(wand_topk(cursors, kk), start=1):
                    qids.append(int(qid))
                    ranks.append(rank)
                    docs.append(int(d))
                    scores.append(float(s))
            yield pd.DataFrame(
                {
                    "query_id": pd.Series(qids, dtype="int64"),
                    "rank": pd.Series(ranks, dtype="int32"),
                    "doc_id": pd.Series(docs, dtype="int64"),
                    "score": pd.Series(scores, dtype="float64"),
                }
            )

    return queries.select(id_col, terms_col).mapInPandas(score, RESULT_SCHEMA)


def ast_topk_batch(
    blocks: DataFrame,
    queries: DataFrame,
    n_docs: int,
    avgdl: float,
    k: int = 10,
    ast_col: str = "query_json",
    id_col: str = "query_id",
) -> DataFrame:
    """Bulk retrieval for FULL query ASTs — the reference's real query
    shape (``DanawaSearchQueryBuilder.java:240-305`` emits
    AND(analyzed terms) + synonym OR subtrees + a boost-0 match_phrase
    per query), scored for a whole DataFrame of queries in ONE job.

    ``queries`` carries each query as its JSON rendering (Q6/Q7
    round-trip format, ``ast.to_json``). Plan mirrors
    :func:`wand_topk_batch`: the batch vocabulary is extracted
    DISTRIBUTED (one mapInPandas pass → distinct term collect, bounded
    by the batch's vocabulary, not its query count), ONE term-pruned
    fetch loads the union postings — with positions only if any query
    contains a phrase — and the broadcast payload feeds per-executor
    cursor trees running the SAME ``execute_ast_cursors`` evaluation
    the serving path runs (rank-identical by construction)."""
    from .ast import ast_terms, from_json
    from .executor import _has_phrase, execute_ast_cursors

    spark = blocks.sparkSession

    def vocab_rows(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            terms: set[str] = set()
            phrase = False
            for spec in pdf[ast_col]:
                ast = from_json(spec)
                terms |= ast_terms(ast)
                phrase = phrase or _has_phrase(ast)
            yield pd.DataFrame(
                {"term": sorted(terms), "phrase": [phrase] * len(terms)}
            )

    vocab_df = (
        queries.select(ast_col)
        .mapInPandas(vocab_rows, "term string, phrase boolean")
        .groupBy("term")
        .agg(F.max("phrase").alias("phrase"))
        .collect()
    )
    vocab = sorted(r["term"] for r in vocab_df)
    needs_positions = any(r["phrase"] for r in vocab_df)
    by_term = fetch_term_blocks(blocks, vocab, with_positions=needs_positions)
    payload = {
        t: (
            [
                (b.first_doc, b.doc_deltas, b.tfs, b.doc_lens, b.max_impact,
                 b.pos_deltas)
                for b in blks
            ],
            df,
        )
        for t, (blks, df) in by_term.items()
    }
    bc = spark.sparkContext.broadcast((payload, n_docs, avgdl, k))

    def score(batches: Iterator) -> Iterator:
        import pandas as pd

        term_payload, n, adl, kk = bc.value
        for pdf in batches:
            qids, ranks, docs, scores = [], [], [], []
            for qid, spec in zip(pdf[id_col], pdf[ast_col]):
                ast = from_json(spec)
                cursors = {}
                for t in sorted(ast_terms(ast)):
                    entry = term_payload.get(t)
                    if entry is None or entry[1] == 0:
                        continue
                    blks = [
                        _Block(fd, bytes(dd), bytes(tf), bytes(dl), mi,
                               bytes(pd_) if pd_ else b"")
                        for fd, dd, tf, dl, mi, pd_ in entry[0]
                    ]
                    cursors[t] = TermCursor(
                        term=t,
                        idf=lucene_idf(n, entry[1]),
                        blocks=blks,
                        avgdl=adl,
                    )
                for rank, (d, s) in enumerate(
                    execute_ast_cursors(ast, cursors, kk), start=1
                ):
                    qids.append(int(qid))
                    ranks.append(rank)
                    docs.append(int(d))
                    scores.append(float(s))
            yield pd.DataFrame(
                {
                    "query_id": pd.Series(qids, dtype="int64"),
                    "rank": pd.Series(ranks, dtype="int32"),
                    "doc_id": pd.Series(docs, dtype="int64"),
                    "score": pd.Series(scores, dtype="float64"),
                }
            )

    return queries.select(id_col, ast_col).mapInPandas(score, RESULT_SCHEMA)
