"""Bulk ``[%FIELD%]value`` text-file reader (S3).

The reference's bulk indexer parses flat files where each line holds
``[%FIELD%]value[%FIELD2%]value2 ...`` records and streams them to ES
(``DanawaBulkTextIndexer.java:50-135``; header pattern
``\\[%([a-zA-Z0-9_-]+)%\\]`` at :32; ``REGISTERDATE`` parsed as
``yyyyMMdd`` at :137-143). Spark-first equivalent: ``spark.read.text``
+ one whole-stage-codegen projection per declared field — no Python in
the row path. The ES "flush every N docs" batching maps to Spark
partition commits (S7).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_bulk_text"]

_HEAD = r"\[%([a-zA-Z0-9_-]+)%\]"


def read_bulk_text(
    spark: SparkSession,
    path: str,
    fields: list[str],
    date_fields: tuple[str, ...] = ("REGISTERDATE",),
) -> DataFrame:
    """Parse bulk text files into a DataFrame with one column per field.

    ``fields`` declares the expected field names (the reference infers
    them per line; a declared schema keeps the plan codegen-friendly and
    lets Catalyst prune unused columns). A field's value runs from its
    header to the next header or end-of-line. Lines with no header are
    dropped (the reference skips non-source files).
    """
    lines = spark.read.text(path).filter(F.col("value").rlike(_HEAD))
    cols = []
    for name in fields:
        # value = text between this header and the next header/EOL
        pat = rf"\[%{name}%\](((?!\[%[a-zA-Z0-9_-]+%\]).)*)"
        c = F.regexp_extract(F.col("value"), pat, 1)
        c = F.when(c == "", None).otherwise(c)
        if name in date_fields:
            c = F.to_date(c, "yyyyMMdd")
        cols.append(c.alias(name))
    return lines.select(*cols)
