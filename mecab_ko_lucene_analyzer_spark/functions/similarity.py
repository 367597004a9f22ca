"""Similarity search over embedding columns (``array<float>``).

* :func:`cosine_topk` — brute-force exact top-k (broadcast the query
  vectors, JVM-side ``zip_with``/``aggregate`` dot products, per-query
  window top-k). The correctness baseline; O(N·Q).
* :func:`lsh_bucket_topk` — the scale path: random-hyperplane LSH
  assigns each vector to 2^n_planes buckets; queries probe only their
  own bucket (plus optional multi-probe neighbors), cutting the scanned
  fraction to ~1/2^n_planes per probe. Hyperplanes are derived
  deterministically from a seed via xxhash64 bit expansion — no stored
  model, reproducible across runs/executors.
* :func:`ivf_topk` — IVF variant: k-means-free coarse quantizer using
  seeded sample centroids (deterministic), vectors assigned to nearest
  centroid; queries probe ``n_probe`` nearest centroids.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

__all__ = ["cosine_topk", "lsh_bucket_topk", "ivf_topk"]


def _dot(a, b) -> Column:
    # multiply in double: float32 products differ from the SQL oracle's
    # double math at the 6th decimal
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(c) -> Column:
    return F.sqrt(
        F.aggregate(
            c,
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "cosine")
    )


def cosine_topk(
    emb: DataFrame, queries: DataFrame, k: int = 10, round_digits: int | None = 6
) -> DataFrame:
    """Exact cosine top-k. ``queries``: (query_id, qv array<float>) —
    must be small (broadcast)."""
    pairs = emb.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _dot(F.col("embedding"), F.col("qv")) / (
        _norm(F.col("embedding")) * _norm(F.col("qv"))
    )
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    scored = pairs.select("query_id", "vec_id", cos.alias("cosine"))
    return _topk_per_query(scored, k)


def _hyperplane_sign(vec: Column, plane: int, dim: int, seed: int) -> Column:
    """Deterministic random hyperplane: component j of plane p is
    ±1 from bit parity of xxhash64(seed, p, j). sign = dot(vec, plane) > 0."""
    comp = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.when(
            F.xxhash64(F.lit(seed), F.lit(plane), j).bitwiseAND(F.lit(1)) == 1, 1.0
        ).otherwise(-1.0),
    )
    return (_dot(vec, comp) > 0).cast("int")


def lsh_bucket_topk(
    emb: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 4,
    seed: int = 42,
    round_digits: int | None = 6,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH bucketing.
    Vectors and queries bucket by the sign pattern of ``n_planes``
    hyperplanes; candidates = same-bucket vectors only."""

    def bucket(vec: Column) -> Column:
        b = F.lit(0)
        for p in range(n_planes):
            b = b * 2 + _hyperplane_sign(vec, p, dim, seed)
        return b

    e = emb.withColumn("bucket", bucket(F.col("embedding")))
    q = queries.withColumn("bucket", bucket(F.col("qv")))
    pairs = e.join(F.broadcast(q), "bucket").filter(F.col("vec_id") != F.col("query_id"))
    cos = _dot(F.col("embedding"), F.col("qv")) / (
        _norm(F.col("embedding")) * _norm(F.col("qv"))
    )
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    scored = pairs.select("query_id", "vec_id", cos.alias("cosine"))
    return _topk_per_query(scored, k)


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    round_digits: int | None = 6,
) -> DataFrame:
    """IVF-style approximate top-k: centroids = deterministic sample of
    the corpus (every (N/n_centroids)-th vector by vec_id order);
    vectors assign to their nearest centroid; queries probe the
    ``n_probe`` nearest centroid lists."""
    spark = emb.sparkSession
    n = emb.count()
    step = max(n // n_centroids, 1)
    centroids = (
        emb.filter((F.col("vec_id") % step == 0) & (F.col("vec_id") / step < n_centroids))
        .select((F.col("vec_id") / step).cast("int").alias("centroid_id"),
                F.col("embedding").alias("cv"))
    )
    cb = F.broadcast(centroids)

    def nearest(df: DataFrame, vec: str, take: int) -> DataFrame:
        cos = _dot(F.col(vec), F.col("cv")) / (_norm(F.col(vec)) * _norm(F.col("cv")))
        scored = df.crossJoin(cb).withColumn("_c", cos)
        w = Window.partitionBy(*df.columns).orderBy(F.desc("_c"))
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= take)
            .drop("_c", "_rn", "cv")
        )

    assigned = nearest(emb, "embedding", 1)
    probed = nearest(queries, "qv", n_probe)
    pairs = assigned.join(F.broadcast(probed), "centroid_id").filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _dot(F.col("embedding"), F.col("qv")) / (
        _norm(F.col("embedding")) * _norm(F.col("qv"))
    )
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    scored = pairs.select("query_id", "vec_id", cos.alias("cosine"))
    return _topk_per_query(scored, k)
