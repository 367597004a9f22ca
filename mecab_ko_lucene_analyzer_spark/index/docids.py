"""Deterministic dense docID assignment (I1).

``monotonically_increasing_id`` is not stable across retries and
``row_number()`` over a global order collapses to one partition; the
scalable deterministic scheme is the classic two-pass rank:

1. range-partition + sort by the natural key (``url``) — a single
   sorted shuffle that also co-locates the corpus for downstream
   per-partition posting builds;
2. count rows per partition (tiny driver-side cumsum → base offsets);
3. per-partition sequential ids on top of the base offset
   (``mapInPandas``, order within the sorted partition is defined).

docID therefore equals the global rank of ``url`` — reproducible under
any cluster size, retry, or input split, which is what makes the build
resumable (I6) and docID-delta encoding meaningful.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

__all__ = ["assign_doc_ids"]


def assign_doc_ids(
    pages: DataFrame,
    key: str = "url",
    num_partitions: int | None = None,
    persist: bool = True,
) -> DataFrame:
    """Return ``pages`` with a dense deterministic ``doc_id`` column,
    partitioned by contiguous docID range (ascending ``key`` order).

    ``persist`` pins the range-shuffled relation (memory-and-disk) so
    the count pass and the tagging pass share ONE shuffle — and,
    critically, see the *same* range boundaries (RangePartitioner
    samples per-job otherwise)."""
    spark = pages.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    parts = pages.repartitionByRange(num_partitions, key).sortWithinPartitions(key)
    parts = parts.withColumn("_pid", F.spark_partition_id())
    if persist:
        from pyspark import StorageLevel

        parts = parts.persist(StorageLevel.MEMORY_AND_DISK)
    # pass 1: per-partition counts → base offsets (small collect: one row
    # per partition, never per doc)
    counts = {
        r["_pid"]: r["cnt"]
        for r in parts.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType(), False)]
        + [f for f in pages.schema.fields]
    )

    def tag(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        base = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = offsets[int(pdf["_pid"].iloc[0])]
            ids = range(base + seen, base + seen + len(pdf))
            seen += len(pdf)
            out = pdf.drop(columns=["_pid"])
            out.insert(0, "doc_id", pd.Series(ids, index=pdf.index, dtype="int64"))
            yield out

    return parts.mapInPandas(tag, out_schema)
