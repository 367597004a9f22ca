"""Embedding k-means for corpus curation (Lloyd's algorithm,
Spark-idiomatic).

Training-data pipelines cluster document embeddings to balance topic
mixes, stratify eval splits, and spot near-duplicate swarms the
text-level dedup family misses. The reference engine has no
counterpart (it is a per-document analyzer); this is one of the
pipeline operators the build adds around it, next to the dedup/ANN
family in ``functions/similarity.py``.

Distributed shape (the canonical scalable Lloyd):

* **Init** — deterministic md5-mod sample of the corpus (the exact
  IVF-centroid pattern, ``similarity.py::ivf_topk``): one narrow
  column-pruned pass, a ``k``-row collect. No RNG, no ``count()`` —
  reproducible across runs/engines, so the operator has an exact
  DuckDB oracle.
* **Assign** — per-row argmin over BROADCAST-LITERAL centroids:
  ``array_min`` of (distance, cid) structs. The billion-row side's
  plan is scan → project — **zero exchange, zero join** per
  iteration. (Literal budget is k·dim doubles in the plan — fine for
  curation-scale k; a 100k-centroid quantizer would switch to a
  broadcast join, which adds a BroadcastExchange but no shuffle.)
* **Update** — ONE map-side-combined hash aggregate per iteration:
  ``groupBy(cluster)`` with ``dim`` column sums + a count; the driver
  receives k rows of (dim+1) doubles and recomputes means. Empty
  clusters keep their previous centroid.

Cross-engine determinism: distances are ``round(·, round_digits)``-ed
before the argmin (ties break to the smaller cid), and centroid
components are rounded at init and after every update — both sides of
the oracle compute ``‖e‖² − 2·e·c + ‖c‖²`` as sequential folds over
the same doubles, so the comparison is bit-stable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .hashing import md5_h64
from .similarity import _dot

__all__ = ["kmeans_fit", "kmeans_assign", "KMEANS_SAMPLE_MOD"]

KMEANS_SAMPLE_MOD = 16  # init candidates ≈ corpus/16, capped at k


def _init_centroids(
    emb: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    sample_mod: int,
    round_digits: int,
) -> list[list[float]]:
    rows = (
        emb.filter(md5_h64(F.col(id_col).cast("string")) % sample_mod == 0)
        .select(id_col, vec_col)
        .orderBy(id_col)
        .limit(int(k))
        .collect()
    )
    if len(rows) < k:
        raise ValueError(
            f"init sample yielded {len(rows)} < k={k} centroids; "
            f"lower sample_mod (corpus too small for mod {sample_mod})"
        )
    return [
        [round(float(v), round_digits) for v in r[vec_col]] for r in rows
    ]


def _best_struct(
    centroids: list[list[float]], vec: Column, round_digits: int
) -> Column:
    """(dist, cid) struct of the nearest centroid: squared-L2 as
    ``‖e‖² − 2·e·c + ‖c‖²`` (the vector-side norm is computed once and
    shared across all k distance expressions), rounded before the
    ``array_min`` so ties break to the smaller cid on every engine."""
    ee = _dot(vec, vec)
    structs: list[Column] = []
    for cid, comp in enumerate(centroids):
        lit = F.array(*[F.lit(float(x)) for x in comp])
        cc = 0.0
        for x in comp:  # sequential fold: same order as the SQL dot
            cc += x * x
        d2 = F.round(
            ee - F.lit(2.0) * _dot(vec, lit) + F.lit(cc), round_digits
        )
        structs.append(
            F.struct(d2.alias("d"), F.lit(int(cid)).alias("cid"))
        )
    return F.array_min(F.array(*structs))


def kmeans_assign(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Nearest-centroid assignment → ``(id, cluster, dist)`` — the
    zero-exchange IVF assignment shape (scan → project; no join, no
    shuffle). ``dist`` is the rounded squared L2 to the winner."""
    best = _best_struct(centroids, F.col(vec_col), round_digits)
    return emb.select(
        F.col(id_col),
        best["cid"].alias("cluster"),
        best["d"].alias("dist"),
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int = KMEANS_SAMPLE_MOD,
    round_digits: int = 6,
) -> tuple[list[list[float]], DataFrame]:
    """Lloyd's k-means: ``n_iter`` (assign → mean-update) rounds from
    the deterministic init. Returns ``(centroids, assignments)`` where
    assignments is the final :func:`kmeans_assign` relation under the
    fitted centroids.

    Per iteration the corpus is read ONCE: the assignment expression
    and the update aggregate share a single projection feeding one
    ``groupBy(cluster)`` hash aggregate of ``dim`` sums + a count
    (map-side combined; the exchange carries ≤ k·(dim+1) doubles per
    input partition) and only k rows reach the driver. Would this
    hold at 100 TB? Yes — cost is n_iter scans with aggregate-only
    shuffles; nothing data-proportional ever collects."""
    first = emb.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("empty embedding relation")
    dim = int(first["d"])
    cents = _init_centroids(
        emb, k, id_col, vec_col, sample_mod, round_digits
    )
    vec = F.col(vec_col)
    for _ in range(int(n_iter)):
        withc = emb.select(
            vec.alias("_v"),
            _best_struct(cents, vec, round_digits)["cid"].alias("cluster"),
        )
        sums = (
            withc.groupBy("cluster")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                *[
                    F.sum(F.element_at("_v", i + 1).cast("double")).alias(
                        f"_s{i}"
                    )
                    for i in range(dim)
                ],
            )
            .collect()
        )
        new = [list(c) for c in cents]  # empty clusters keep position
        for r in sums:
            n = float(r["_n"])
            new[int(r["cluster"])] = [
                round(float(r[f"_s{i}"]) / n, round_digits)
                for i in range(dim)
            ]
        cents = new
    return cents, kmeans_assign(emb, cents, id_col, vec_col, round_digits)
