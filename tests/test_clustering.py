"""Embedding k-means (functions/clustering.py): hand-geometry ground
truth, determinism, tie-breaks, argmin plan shape."""

import pytest
import pyspark.sql.functions as F

from mecab_ko_lucene_analyzer_spark.functions.clustering import (
    kmeans_assign,
    kmeans_fit,
)


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_kmeans_two_obvious_groups(spark):
    """Two tight groups around (0,0) and (10,10); ids 0 and 1 sit one
    in each group so the deterministic init (sample_mod=1 → first k by
    id) starts with one centroid per group. Two Lloyd rounds must land
    each centroid on its group mean and assign perfectly."""
    a = [(0, (0.0, 0.5)), (2, (0.5, 0.0)), (4, (-0.5, 0.0)), (6, (0.0, -0.5))]
    b = [(1, (10.0, 10.5)), (3, (10.5, 10.0)), (5, (9.5, 10.0)), (7, (10.0, 9.5))]
    emb = _emb(spark, a + b)
    cents, assigned = kmeans_fit(emb, k=2, n_iter=2, sample_mod=1)
    got = {r.vec_id: r.cluster for r in assigned.collect()}
    assert {got[i] for i, _ in a} == {0}
    assert {got[i] for i, _ in b} == {1}
    assert cents[0] == pytest.approx([0.0, 0.0], abs=1e-9)
    assert cents[1] == pytest.approx([10.0, 10.0], abs=1e-9)
    # dist is the rounded squared L2 to the winning centroid
    dists = {r.vec_id: r.dist for r in assigned.collect()}
    assert dists[0] == pytest.approx(0.25, abs=1e-9)


def test_kmeans_assign_tie_breaks_to_smaller_cid(spark):
    """A point exactly between two centroids goes to the smaller
    cluster id (distances round before the argmin)."""
    emb = _emb(spark, [(0, (5.0, 0.0))])
    got = kmeans_assign(emb, [[0.0, 0.0], [10.0, 0.0]]).collect()[0]
    assert got.cluster == 0
    assert got.dist == pytest.approx(25.0, abs=1e-9)


def test_kmeans_fit_is_deterministic(spark):
    emb = _emb(
        spark,
        [(i, (float(i % 7), float((3 * i) % 11))) for i in range(40)],
    )
    c1, a1 = kmeans_fit(emb, k=3, n_iter=2, sample_mod=2)
    c2, a2 = kmeans_fit(emb, k=3, n_iter=2, sample_mod=2)
    assert c1 == c2
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))


def test_kmeans_init_raises_when_sample_too_small(spark):
    emb = _emb(spark, [(0, (0.0,)), (1, (1.0,))])
    with pytest.raises(ValueError):
        kmeans_fit(emb, k=64, n_iter=1, sample_mod=16)


def test_kmeans_reduces_inertia(spark):
    """Lloyd monotonicity (up to the 1e-6 rounding of centroids):
    total assigned squared distance after fitting <= after the init
    assignment."""
    rows = [(i, ((i * 37) % 13 / 3.0, (i * 59) % 17 / 5.0)) for i in range(60)]
    emb = _emb(spark, rows)
    from mecab_ko_lucene_analyzer_spark.functions.clustering import (
        _init_centroids,
    )

    init = _init_centroids(emb, 4, "vec_id", "embedding", 2, 6)
    before = kmeans_assign(emb, init).agg(F.sum("dist")).first()[0]
    cents, assigned = kmeans_fit(emb, k=4, n_iter=3, sample_mod=2)
    after = assigned.agg(F.sum("dist")).first()[0]
    assert after <= before + 1e-6


def test_kmeans_assignment_plan_has_no_exchange(spark):
    """The assignment stage is scan -> project: zero Exchange nodes —
    the property that makes per-iteration cost a single pass at
    100 TB."""
    emb = _emb(spark, [(i, (float(i), 0.0)) for i in range(10)])
    plan = kmeans_assign(
        emb, [[0.0, 0.0], [5.0, 0.0]]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
