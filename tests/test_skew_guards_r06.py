"""Round-6 skew guards (r5 verdict ask #8): planted single-hot-key
corpora through span_dedup and dedup_clusters, exact outputs asserted.

* span_dedup: a boilerplate span repeated across 100k docs is a
  corpus-wide near-constant key — the winner selection must stay a
  map-side-combined aggregate (one candidate per input partition per
  span hash), never a windowed sort of the hot key on one task.
* dedup_clusters: one giant duplicate class (a star of 100k docs all
  paired with doc 0) drives the pointer-doubling join; the component
  must resolve to a single cluster labeled by the min doc_id in
  O(log diameter) rounds.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F

from mecab_ko_lucene_analyzer_spark.functions.curation import span_dedup
from mecab_ko_lucene_analyzer_spark.functions.dedup import dedup_clusters


def _nodes(df):
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return plan, re.findall(r"\(\d+\) ([A-Za-z][A-Za-z0-9_]*)", plan)


def test_span_dedup_corpus_wide_boilerplate_span(spark):
    """100k docs share one boilerplate span; each also has a unique
    span. Exact law: the boilerplate survives ONLY in doc 0 (global
    min (doc_id, span_idx)); every unique span survives. The winner
    aggregation must show map-side partial combine in the plan."""
    n = 100_000
    w = 4
    boiler = "click here to subscribe"  # 4 tokens = one span at window 4
    docs = spark.range(n, numPartitions=32).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(boiler + " unique token row "),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    out = span_dedup(docs, window=w)
    plan, nodes = _nodes(out)
    # the hot span key is tamed by partial aggregation before its
    # exchange — a row_number window over the hot key would sort 100k
    # rows on one task
    assert "partial_min" in plan or "partial_count" in plan
    assert "Window" not in nodes
    rows = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert len(rows) == n
    # doc 0 keeps both spans (boilerplate won globally + its unique)
    assert rows[0]["clean_text"] == boiler + " unique token row 0"
    assert rows[0]["n_spans_kept"] == 2
    assert rows[0]["n_spans_removed"] == 0
    # every other doc loses exactly the boilerplate span
    for probe in (1, 12_345, n - 1):
        assert rows[probe]["clean_text"] == f"unique token row {probe}"
        assert rows[probe]["n_spans_kept"] == 1
        assert rows[probe]["n_spans_removed"] == 1


def test_dedup_clusters_giant_duplicate_class(spark):
    """A single duplicate class of 100k members (star edges hub=5 plus
    a chain tail) must collapse to ONE cluster labeled by the min
    doc_id, in pointer-doubling-bounded rounds, with exact membership."""
    n = 100_000
    # star: (5, i) for i in 6..n+4  → min id 5; plus a separate pair
    star = spark.range(6, n + 5, numPartitions=32).select(
        F.lit(5).alias("doc_a"), F.col("id").alias("doc_b")
    )
    pair = spark.createDataFrame(
        [(200_000, 200_001)], "doc_a long, doc_b long"
    )
    rounds: list = []
    labels = dedup_clusters(star.unionByName(pair), rounds_out=rounds)
    agg = labels.groupBy("cluster_id").agg(
        F.count("*").alias("n"), F.min("doc_id").alias("lo"),
        F.max("doc_id").alias("hi"),
    )
    rows = {r["cluster_id"]: r.asDict() for r in agg.collect()}
    assert set(rows) == {5, 200_000}
    assert rows[5]["n"] == n  # hub + n-1 leaves
    assert rows[5]["lo"] == 5 and rows[5]["hi"] == n + 4
    assert rows[200_000]["n"] == 2
    # star diameter 2: pointer doubling converges in <= 3 rounds
    # (1 propagation + 1 no-change confirmation + slack)
    assert rounds[0] <= 3
