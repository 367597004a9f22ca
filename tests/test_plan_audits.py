"""Physical-plan regression guards for the contract queries.

The scale story lives in the PLAN, not the sf0.01 timings: a refactor
that silently introduces a row-at-a-time Python UDF, an unbroadcast
cartesian product, or an extra shuffle passes every value-level test
and only shows up as a 100x-scale meltdown. These audits pin the plan
shape of every ``queries()`` entry so that regression is loud.

Ceilings are the measured shuffle counts of the current plans (scout:
zero ``BatchEvalPython``, zero ``CartesianProduct``, per-query shuffle
budgets of 0-10). They are upper bounds, not exact pins — an optimizer
improvement that REMOVES a shuffle keeps passing; anything that adds
one fails and must either be justified (raise the ceiling in the same
commit, with the why) or fixed.
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

# measured current shuffle (Exchange) counts; a regression budget, not
# a target. Narrow per-doc operators (fingerprint, lang_id, quality,
# token_count, stratified_sample) must stay at ZERO shuffles — they are
# single-pass map work at any scale.
#
# Round-6 note: queries built on the fanned-out token/doc relations
# (functions/partitioning.py::fan_out — a SIZE-GATED round-robin
# repartition that parallelizes under-split single-row-group inputs)
# carry that exchange in the static plan, once per occurrence of the
# subtree (ReuseExchange collapses repeats at runtime). At real scale
# the gate makes fan_out a no-op, so these exchanges are absent by
# construction; the ceilings below include them because the audit runs
# at sf0.001 where the gate fires.
SHUFFLE_CEILING = {
    # 1 = the size-gated fan_out exchange (tiny-input parallelization;
    # no-op at scale) — the tokenize itself is still single-pass map work
    "analyze_ko_tokens": 1,
    # per-row extraction: zero exchanges (the bm25f pipeline's 7 =
    # incoming join + weighted-union aggs + broadcast-scalar reuse,
    # same shape family as bm25_topk)
    "anchor_texts": 0,
    "incoming_anchors": 2,
    "anchor_bm25f_topk": 11,
    # PageRank prior (the pagerank_hosts 19, iteration-proportional,
    # |nodes|-sized) + the bm25_topk pipeline + the pre-top-k blend
    # joins; all data-proportional exchanges are term- or host-pruned
    "boosted_bm25_topk": 34,
    "extract_title": 0,
    # _ws_index-backed expansion family: the 5 = tokenize→postings agg
    # + stats aggs + the per-doc score agg (all term-pruned or
    # vocab-sized); suggest's 2 are both VOCABULARY-sized aggregates
    # (the only input is term_stats); freshness's 1 is the doc_ts
    # projection's single agg-shuffle for the broadcast max-ts scalar
    "msm_topk": 8,
    "mlt_topk": 8,
    "prefix_topk": 8,
    "fuzzy_topk": 8,
    "related_terms": 8,
    "suggest_terms": 3,
    "freshness_boost": 1,
    # facet family: tokenize→postings agg + the matched-docs agg; the
    # attr join broadcasts at sf (AQE decides at scale) and the facet
    # count is map-side combined into the final TakeOrdered. The
    # histogram's +1 is its bucket agg (facet's value agg folds into
    # the TakeOrdered's local sort at this size).
    "facet_terms": 3,
    # composite-key facet: same shape as facet_terms (matched agg +
    # the attr join + one map-side-combined tuple count TakeOrdered)
    "multi_terms": 3,
    "date_histogram": 4,
    # stats' 2 = the postings/matched aggs; the global stats row is a
    # partial-combined single-row gather
    "stats_agg": 4,
    # regexp/filtered ride the bm25_scored chain (5 = tokenize→postings
    # agg + stats aggs + per-doc score agg; the regexp's vocabulary
    # probe and the filter's semi join both broadcast at sf)
    "regexp_topk": 8,
    "filtered_topk": 8,
    # sort-by-field: ONE matched-docs agg, then TakeOrdered (scoring
    # skipped — no score agg at all); the attr join broadcasts
    "sort_by_field": 2,
    # percentiles: matched agg + the single-row exact-percentile
    # gather (the documented non-scale baseline; HLL/approx is the
    # scale path); cardinality/histogram add their value agg
    "percentiles_agg": 3,
    "cardinality_agg": 4,
    "histogram_agg": 4,
    # significance needs every term in the matched docs: the 5 = the
    # matched-docs agg + the un-pruned postings agg + the semi join's
    # exchanges (ES bounds this with shard sampling at scale; callers
    # pass a sampled match set — see the docstring)
    "significant_terms": 8,
    # sampler-bounded significance: the bm25_scored chain feeding the
    # ≤SAMPLER_SIZE sample (its 5) + the sample semi join's pair + the
    # fg term agg + the vocab join — every relation after the cut is
    # sample-bounded, the postings semi-join included
    "sampler_sigterms": 14,
    # exact long-tail cut: the (tokens ∪ synthetic tail) distinct +
    # the |vocab|-sized df agg, then a pushed filter + TakeOrdered
    "rare_terms": 3,
    # buckets (facet, tiny, broadcast back) + the scored chain + ONE
    # per-bucket window exchange — grouped top-k, never a global sort
    "top_hits": 13,
    # the rescore window re-enters as a ≤50-row literal relation (the
    # bounded ES window fetch): the 2 = the windowed scorer's own
    # TakeOrdered feed + the min-dist pair agg over the id-pruned scan
    "rescore_topk": 2,
    # percolate: the doc side's distinct-token agg + the (doc, query)
    # match agg, x2 for the contract's and/msm union branches; the
    # stored-query side always broadcasts
    "percolate": 6,
    # pure narrow map work — MUST stay at zero at any scale
    "weighted_sample": 0,
    "chunk_documents": 0,
    # hybrid RRF: the bm25_scored agg chain (as explain's 4) + the
    # cosine side's one per-query top-k agg + the fused-contribs agg;
    # both rank windows run over <= n_candidates rows by contract
    "rrf_fusion_topk": 10,
    # explain keeps bm25's un-aggregated per-(doc,term) rows: the 4 =
    # tokenize→postings agg + doc_stats agg + the idf-side stats agg +
    # the doc_len join exchange (term-pruned input throughout)
    "explain_score": 7,
    # collapse = the bm25_topk scoring chain + the attr join + the ONE
    # per-group window exchange (grouped top-k, never a global sort)
    "collapse_topk": 9,
    "blocklist_stats": 0,
    # per-doc (doc_id, term) hash agg — one exchange at any scale
    "term_vectors": 1,
    "ann_cosine_topk": 2,
    "ann_ivf_topk": 2,
    "ann_lsh_topk": 2,
    "batch_bm25_topk": 0,
    "bm25_topk": 3,
    "canonical_urls": 0,
    "corpus_stats": 3,
    "decontaminate": 2,
    "dedup_clusters": 0,
    "dedup_exact": 1,
    "doc_stats": 3,
    "domain_stats": 1,
    "emb_near_dup": 2,
    "extract_links": 0,
    "host_link_graph": 1,
    # 3 unrolled power iterations: each shuffles the rank vector into
    # the (pre-partitioned, persisted) edge join + one agg by dst; the
    # edge relation itself partitions once. |nodes|-sized exchanges
    # only — the count is iteration-proportional, not data-proportional.
    "pagerank_hosts": 19,
    "detect_charset": 0,
    "robots_noindex": 0,
    "extract_text": 0,
    "fingerprint": 0,
    "highlight_spans": 0,
    "lang_id": 0,
    "kmeans_clusters": 0,
    "match_count": 0,
    "minhash_near_dup": 3,
    "multimodal_features": 0,
    "nested_phrase_topk": 0,
    "normalize_nfc": 0,
    "not_topk": 0,
    "pack_manifest": 2,
    "ngram_jaccard_pairs": 3,
    "phrase_match": 0,
    "phrase_match_distributed": 10,
    "pii_redact": 0,
    "postings_tf": 2,
    "product_tokens": 0,
    "quality_score": 0,
    "repetition_stats": 0,
    "scroll_page": 0,
    "search_after_page": 0,
    "simhash_candidates": 3,
    "simhash_verified": 3,
    "span_dedup": 2,
    "stratified_sample": 0,
    "streaming_dedup": 0,
    "streaming_postings_tf": 0,
    "synonym_or_topk": 0,
    "term_stats": 3,
    "token_count": 0,
    "unigram_logprob": 2,
    # compound queries (session 16): dis_max scores every clause from
    # ONE postings scan (the 5 = the shared _ws_index agg chain + one
    # per-doc conditional-sum agg — clause count adds columns, never
    # exchanges); boosting adds the negative match set's distinct agg
    # to the scored chain; constant_score is matching_docs' single
    # agg; wildcard rides the bm25_scored chain like regexp
    "dis_max_topk": 8,
    "boosting_topk": 10,
    "constant_score": 2,
    "wildcard_topk": 8,
    # block scan → decode → ONE doc_id agg (+ the block build's own
    # aggs at this sf); expansion fan-in is a label explode, no join
    "phrase_prefix_match": 4,
    # agg batch 2: range/extended_stats/weighted_avg are the matched
    # agg + ONE conditional/global aggregate (range's unpivot is a
    # literal stack, exchange-free); composite's 2 = matched agg +
    # bucket agg (the keyset filter is post-aggregate, costless);
    # filters' 5 = postings agg chain + the per-bucket
    # distinct-doc agg (count_distinct expands) + the literal-frame
    # left join's gather
    "range_agg": 3,
    "extended_stats_agg": 3,
    "weighted_avg_agg": 3,
    "composite_agg": 3,
    "filters_agg": 6,
    # curation/LM batch: keywords = postings+stats aggs + the term
    # join + ONE per-doc window; gopher is pure narrow map work (MUST
    # stay zero); bigram = bigram agg + unigram agg + per-doc agg
    # (the count join reuses the bigram partitioning); suggester
    # exchanges are ALL vocabulary-sized (term_stats is the only
    # input) + one |terms|-row window
    "tfidf_keywords": 6,
    "gopher_rules": 0,
    "bigram_logprob": 3,
    "phrase_suggest": 6,
    # the returned frame is the memory sink's materialized rows (the
    # streaming aggregation itself runs inside the micro-batch
    # executor, like streaming_postings_tf/streaming_dedup)
    "streaming_window_stats": 0,
    # DSIR: two dim-bounded bucket-count aggs (raw + target LMs,
    # persisted) + the per-doc score agg; the log-prob table rides a
    # BROADCAST join, so the feature explode never shuffles. The
    # Gumbel sampler adds arithmetic only — same ceiling.
    "dsir_logratio": 4,
    "dsir_sample": 4,
    # NB classifier: labeled-features agg (dim-bounded) + the label
    # join + the per-doc score agg; the weight table broadcasts
    # legitimately (fixed dim — the DSIR justification)
    "nb_quality": 3,
    # host_cap: over-host count agg (map-side combined) + the pre-cut
    # candidates' window exchange + the keep-id semi join's pair — the
    # under-cap BULK of the corpus rides broadcast anti/semi host
    # joins and never shuffles
    "host_cap": 4,
    # robots: plain host-keyed rules join (Catalyst broadcasts from
    # SIZE STATS at sf — never a forced hint; shuffle join at scale) +
    # ONE per-doc decision agg + the no-match left join back (both
    # doc_id-keyed)
    "robots_allowed": 2,
    # adjacency_matrix: the (bucket, doc) relation appears in the
    # singles agg and BOTH self-join sides, each carrying the
    # tokenize→postings agg chain in the STATIC plan — AQE's
    # ReusedExchange collapses the repeats at runtime, and every
    # relation is match-set-bounded (never corpus-wide)
    "adjacency_matrix": 15,
    # terms_set rides the bm25_scored chain + the per-doc threshold
    # join (doc_id-keyed both sides)
    "terms_set_topk": 8,
    # matched agg + one global conditional aggregate each (range_agg
    # family — the unpivot/count is a literal, exchange-free)
    "date_range_agg": 3,
    "missing_agg": 3,
    # session windows: ONE key-partitioned exchange (session merge is
    # a per-partition sort within the aggregate)
    "session_stats": 1,
}

_NODE = re.compile(r"\(\d+\) ([A-Za-z][A-Za-z0-9_]*)")


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def plans(spark):
    """name -> (formatted plan string, node-name list) for every
    contract query. Built once: several callables eagerly build the
    serving index / run a micro-stream for SF, so per-test calls would
    multiply that cost."""
    # Audit the COLD canonical plans: earlier suite modules leave
    # persisted intermediates in the session CacheManager (e.g.
    # pagerank's hash-partitioned `frac` edge relation), and cache
    # substitution into a fresh plan loses the recognized partitioning
    # across expr-ids — measured +1 Exchange per PageRank iteration
    # when test_entry_contract ran first. Later modules that still use
    # their own caches merely recompute once. The entry module's own
    # memos (e.g. the persisted block-index partials behind
    # phrase_match_distributed) must be dropped WITH the cache — a
    # memoized DataFrame whose persist flag was just cleared would
    # plan cold while the ceiling assumes its InMemoryRelation.
    spark.catalog.clearCache()
    entrymod._WS_INDEX_CACHE.clear()
    out = {}
    for name, fn in entrymod.queries().items():
        p = _plan(fn(spark, SF))
        out[name] = (p, _NODE.findall(p))
    return out


def test_queries_cover_the_ceiling_table(plans):
    assert sorted(plans) == sorted(SHUFFLE_CEILING)


def test_no_row_at_a_time_python_udf(plans):
    """Python reaches the executors only through Arrow batches
    (ArrowEvalPython / MapInPandas / MapInArrow) — a BatchEvalPython
    node is a ~10-100x per-row serialization regression."""
    offenders = {n for n, (_, nodes) in plans.items() if "BatchEvalPython" in nodes}
    assert not offenders, offenders


def test_no_cartesian_product(plans):
    """Every cross-shaped join must broadcast its small side
    (BroadcastNestedLoopJoin); a CartesianProduct node shuffles BOTH
    sides everywhere and is never acceptable in a contract plan."""
    offenders = {n for n, (_, nodes) in plans.items() if "CartesianProduct" in nodes}
    assert not offenders, offenders


def test_shuffle_budgets(plans):
    over = {
        name: (nodes.count("Exchange"), SHUFFLE_CEILING[name])
        for name, (_, nodes) in plans.items()
        if nodes.count("Exchange") > SHUFFLE_CEILING[name]
    }
    assert not over, f"shuffle budget exceeded (got, ceiling): {over}"


def test_ann_broadcasts_the_query_side(plans):
    """cosine/LSH/IVF top-k: the query set rides a broadcast; the one
    permitted shuffle is the final per-query top-k aggregation. The
    embeddings side must reach its join with zero exchanges."""
    for name in ("ann_cosine_topk", "ann_lsh_topk", "ann_ivf_topk"):
        _, nodes = plans[name]
        assert nodes.count("BroadcastExchange") >= 1, name
        # <= 2: per-query top-k aggregation + the size-gated fan_out
        # exchange on the embeddings side (no-op at real scale)
        assert nodes.count("Exchange") <= 2, name


def test_decontaminate_broadcasts_the_eval_side(plans):
    """decontaminate: the eval shingle relation is broadcast (benchmark
    suites are tiny next to a crawl); the corpus side reaches the join
    with no exchange. The 2 permitted shuffles are the eval-side
    distinct and the per-doc match-count aggregation."""
    _, nodes = plans["decontaminate"]
    assert nodes.count("BroadcastExchange") >= 1


def test_postings_scan_prunes_to_used_columns(plans):
    """postings_tf projects (doc_id, text): the parquet ReadSchema must
    not drag lang/source/n_chars through the scan — at 100 TB those
    columns are a material fraction of the bytes."""
    p, _ = plans["postings_tf"]
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m, "no parquet ReadSchema in the postings_tf plan"
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols <= {"doc_id", "text"}, cols


def test_no_forced_broadcast_of_corpus_unbounded_relations(spark):
    """Round-4 verdict's four 100×-scale-killers, pinned fixed: the
    significant_terms background vocabulary (term_stats), the
    unigram/bigram LM vocab tables, and the robots per-host rules are
    all corpus-unbounded — none may carry a compile-time broadcast
    hint. Catalyst/AQE may still *choose* broadcast at small scale
    from real size stats (fine — that adapts); a ResolvedHint in the
    optimized logical plan is the forced version that OOMs at 10^12
    docs."""
    import __spark_entry__ as em

    for name in (
        "significant_terms",
        "unigram_logprob",
        "bigram_logprob",
        "robots_allowed",
    ):
        lp = (
            em.queries()[name](spark, SF)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "ResolvedHint" not in lp, name
        assert "UnresolvedHint" not in lp, name


def test_exact_dedup_is_one_hash_shuffle(plans):
    """dedup_exact: one Exchange (the md5 hash partitioning); nothing
    broadcast — duplicate-group tables are unbounded at crawl scale."""
    _, nodes = plans["dedup_exact"]
    assert nodes.count("Exchange") == 1
    assert nodes.count("BroadcastExchange") == 0
