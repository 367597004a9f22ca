"""Scan fan-out for under-split inputs (guide §2.2 / §6).

A parquet file is split for scheduling by BYTE ranges, but a row group
is consumed whole by the split that contains it — a small table written
as one file with one row group therefore runs every downstream narrow
stage (mapInArrow / mapInPandas / per-row expressions) as ONE busy task
no matter how many cores the session has. :func:`fan_out` inserts a
round-robin repartition exactly when that under-split is possible and
provably cheap to fix, and is a no-op otherwise:

* the decision is made from the relation's input FILES (driver-side
  listing + ``stat``, ~2 ms) — never from the data;
* when total input bytes >= ``maxPartitionBytes x defaultParallelism``
  the scan already plans at least one split per core, so nothing is
  repartitioned — at real (100 TB) scale this helper never shuffles;
* below that, the added exchange moves at most
  ``maxPartitionBytes x cores`` bytes of the *narrow projection* it is
  applied to — bounded by configuration, not by data size;
* relations with no resolvable input files (streams, local relations,
  post-shuffle plans, object stores that cannot be stat'ed cheaply)
  pass through untouched.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

__all__ = ["fan_out"]


def _local_path(uri: str) -> str | None:
    if uri.startswith("file:"):
        path = uri[len("file:") :]
        while path.startswith("//"):
            path = path[1:]
        return path
    if uri.startswith("/"):
        return uri
    return None


_UNITS = {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def _parse_bytes(value: str) -> int:
    """Spark size strings: plain bytes ("134217728") or suffixed
    ("128m", "128MB", "1g")."""
    s = value.strip().lower()
    if s.endswith("b") and not s[:-1].isdigit():
        s = s[:-1]
    if s and s[-1] in _UNITS:
        return int(s[:-1]) * _UNITS[s[-1]]
    return int(s)


def fan_out(
    df: DataFrame,
    parts_per_core: int = 2,
    bytes_per_part: int | None = None,
) -> DataFrame:
    """Repartition ``df`` to ``parts_per_core x defaultParallelism``
    round-robin partitions iff its source files are small enough that
    the scan may under-split (see module doc). Apply to the narrowest
    projection that downstream work needs, BEFORE expensive per-row
    expressions, so those also spread.

    ``bytes_per_part`` switches to byte-proportional sizing:
    ``clamp(input_bytes / bytes_per_part, min(8, cores), parts_per_core
    x cores)``. Use it for cheap JVM consumers (explode + codegen
    aggregation), where measured optima sit at FAR fewer partitions
    than cores — per-task scheduling and per-partition aggregation
    overhead dominates once partitions shrink below a few hundred KB
    (measured on the token-aggregation family: 8-16 partitions beat 64
    at both 0.5 MB and 6 MB inputs, 2-3x). Python-boundary consumers
    (mapInArrow/mapInPandas, interpreted HOF expressions) should keep
    the default: their per-row cost is high enough that every core
    pays off."""
    spark = df.sparkSession
    sc = spark.sparkContext
    cores = sc.defaultParallelism
    if cores <= 1:
        return df
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if not files:
        return df
    total = 0
    for uri in files:
        path = _local_path(uri)
        if path is None:
            return df
        try:
            total += os.path.getsize(path)
        except OSError:
            return df
    try:
        max_split = _parse_bytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes")
        )
    except Exception:
        max_split = 128 * 1024 * 1024
    if total >= max_split * cores:
        return df
    if bytes_per_part:
        n = max(
            min(8, cores),
            min(parts_per_core * cores, -(-total // bytes_per_part)),
        )
        return df.repartition(n)
    return df.repartition(parts_per_core * cores)
