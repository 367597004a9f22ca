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


def _hot_vocab(
    term_stats: DataFrame | None,
    vocab: list[str],
    max_broadcast_df: int | None,
) -> set[str]:
    """Terms whose df exceeds the broadcast budget. The same guard the
    serving router applies per query (``router.py``), applied to the
    BATCH vocabulary: a josa-class term in one query of a million-query
    batch must not pull its (at 10^12 docs, multi-GB) block list into
    the driver fetch + executor broadcast."""
    if term_stats is None or max_broadcast_df is None or not vocab:
        return set()
    from .router import term_dfs

    dfs = term_dfs(term_stats, vocab)
    return {t for t, df in dfs.items() if df > max_broadcast_df}


def _hot_results_df(spark, rows: list[tuple[int, int, int, float]]):
    return spark.createDataFrame(rows, RESULT_SCHEMA)


def wand_topk_batch(
    blocks: DataFrame,
    queries: DataFrame,
    n_docs: int,
    avgdl: float,
    k: int = 10,
    terms_col: str = "terms",
    id_col: str = "query_id",
    term_stats: DataFrame | None = None,
    max_broadcast_df: int | None = None,
) -> DataFrame:
    """Score every query row (``query_id``, ``terms array<string>``)
    against the block index; returns (query_id, rank, doc_id, score),
    rank-identical to the serving path's :func:`wand_topk` per query.

    With ``term_stats`` + ``max_broadcast_df``, queries containing a
    hot term (df above the budget) are routed to the distributed
    scorer (``router.py::bm25_topk_blocks``) instead of riding the
    broadcast — one Spark job per hot query, driver traffic O(k).
    Hot queries are assumed rare in a batch (they are the head of the
    df distribution, not the head of the query distribution)."""
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
    hot = _hot_vocab(term_stats, vocab, max_broadcast_df)
    hot_part = None
    if hot:
        from .router import bm25_topk_blocks, term_dfs

        # only the hot queries come to the driver (distributed filter)
        hot_lit = F.array(*[F.lit(t) for t in sorted(hot)])
        hot_rows = [
            (r[id_col], list(r[terms_col]))
            for r in queries.filter(
                F.arrays_overlap(F.col(terms_col), hot_lit)
            ).select(id_col, terms_col).collect()
        ]
        hot_ids = {qid for qid, _t in hot_rows}
        out_rows: list[tuple[int, int, int, float]] = []
        for qid, terms in hot_rows:
            dfs = term_dfs(term_stats, sorted(set(terms)))
            hits = bm25_topk_blocks(blocks, dfs, n_docs, avgdl, k)
            out_rows.extend(
                (int(qid), rank, int(d), float(s))
                for rank, (d, s) in enumerate(hits, start=1)
            )
        hot_part = _hot_results_df(spark, out_rows)
        queries = queries.filter(~F.col(id_col).isin(sorted(hot_ids)))
        vocab = [t for t in vocab if t not in hot]
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

    cold = queries.select(id_col, terms_col).mapInPandas(score, RESULT_SCHEMA)
    return cold.unionByName(hot_part) if hot_part is not None else cold


def ast_topk_batch(
    blocks: DataFrame,
    queries: DataFrame,
    n_docs: int,
    avgdl: float,
    k: int = 10,
    ast_col: str = "query_json",
    id_col: str = "query_id",
    term_stats: DataFrame | None = None,
    max_broadcast_df: int | None = None,
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
    hot = _hot_vocab(term_stats, vocab, max_broadcast_df)
    hot_part = None
    if hot:
        from .executor import execute_ast
        from .router import ast_routable, distributed_ast_topk, term_dfs

        # flag hot queries DISTRIBUTED (the parse runs executor-side);
        # only those rows come to the driver
        hot_set = hot

        def flag_hot(batches: Iterator) -> Iterator:
            import pandas as pd

            for pdf in batches:
                keep_ids, keep_specs = [], []
                for qid, spec in zip(pdf[id_col], pdf[ast_col]):
                    if ast_terms(from_json(spec)) & hot_set:
                        keep_ids.append(int(qid))
                        keep_specs.append(spec)
                yield pd.DataFrame(
                    {"query_id": pd.Series(keep_ids, dtype="int64"),
                     "query_json": pd.Series(keep_specs, dtype="object")}
                )

        hot_rows = (
            queries.select(id_col, ast_col)
            .mapInPandas(flag_hot, "query_id long, query_json string")
            .collect()
        )
        hot_ids = {r["query_id"] for r in hot_rows}
        out_rows: list[tuple[int, int, int, float]] = []
        for r in hot_rows:
            ast = from_json(r["query_json"])
            dfs = term_dfs(term_stats, sorted(ast_terms(ast)))
            if ast_routable(ast):
                hits = distributed_ast_topk(ast, blocks, dfs, n_docs, avgdl, k)
            else:
                # defensive: only an unknown node type is unroutable
                # now (every Term/And/Or/Phrase shape routes) — keep
                # the driver fallback so new AST nodes degrade safely
                hits = execute_ast(ast, blocks, term_stats, n_docs, avgdl, k)
            out_rows.extend(
                (int(r["query_id"]), rank, int(d), float(s))
                for rank, (d, s) in enumerate(hits, start=1)
            )
        hot_part = _hot_results_df(spark, out_rows)
        queries = queries.filter(~F.col(id_col).isin(sorted(hot_ids)))
        vocab = [t for t in vocab if t not in hot]
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

    cold = queries.select(id_col, ast_col).mapInPandas(score, RESULT_SCHEMA)
    return cold.unionByName(hot_part) if hot_part is not None else cold
