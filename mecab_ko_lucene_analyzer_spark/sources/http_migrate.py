"""S4: paged-HTTP legacy-engine migrator, Spark-first.

Reference behavior (``index/FastcatMigrateIndexer.java:66-129``): GET
``url&sn=<start>&ln=<page>`` pages; each JSON response carries
``total_count``, ``fieldname_list`` and ``result`` rows; rows are
sanitized (``[\\t\\r\\n\\0]`` → space) and either appended to a
``[%FIELD%]``-framed bulk file (the S3 reader's format) or bulk-indexed.
The reference pulls every page through one driver-side loop.

Here the page space is the parallelism axis: one driver probe discovers
``total_count`` and the schema, then a DataFrame of page starts fans
out across executors via ``mapInPandas`` — each task pulls its own
pages, so a 10^9-row legacy dump migrates at cluster width instead of
single-connection speed (the legacy API sees ``num_fetchers``
concurrent readers; size accordingly).

``fetch_page(sn, ln) -> dict`` is pluggable: :func:`http_fetcher` gives
the reference-compatible urllib GET; tests inject a pure-Python fake
(no network in this container).
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

__all__ = ["migrate_paged", "http_fetcher", "to_bulk_text"]

_CTRL = re.compile(r"[\t\r\n\0]")


def http_fetcher(url: str, timeout: int = 30) -> Callable[[int, int], dict]:
    """The reference's GET contract: ``url&sn=<start>&ln=<length>`` →
    parsed JSON dict. Import-light (stdlib urllib), constructed lazily
    inside executor tasks so the closure serializes cleanly."""

    def fetch(sn: int, ln: int) -> dict:
        import json
        import urllib.request

        with urllib.request.urlopen(f"{url}&sn={sn}&ln={ln}", timeout=timeout) as r:
            return json.load(r)

    return fetch


def migrate_paged(
    spark: SparkSession,
    fetch_page: Callable[[int, int], dict],
    length: int = 1000,
    start: int = 0,
    num_fetchers: int | None = None,
) -> DataFrame:
    """Paged legacy source → DataFrame (all columns string, the bulk
    format's type system; cast downstream).

    One driver probe (page 0) fixes ``total_count`` + column order;
    every remaining page is fetched executor-side.
    """
    import pandas as pd
    import pyspark.sql.types as T

    first = fetch_page(start, length)
    total = int(first.get("total_count", start + len(first.get("result", []))))
    fields = [str(f) for f in first["fieldname_list"]]
    schema = T.StructType([T.StructField(f, T.StringType(), True) for f in fields])

    def rows_of(resp: dict) -> list[list[str]]:
        return [
            [_CTRL.sub(" ", str(row.get(f, ""))) for f in fields]
            for row in resp.get("result", [])
        ]

    first_rows = rows_of(first)
    page_starts = list(range(start + length, total, length))
    if not page_starts:
        return spark.createDataFrame(first_rows, schema)
    if num_fetchers is None:
        num_fetchers = min(len(page_starts), spark.sparkContext.defaultParallelism)

    def fetch_pages(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for sn in pdf["sn"]:
                got = rows_of(fetch_page(int(sn), length))
                if got:
                    yield pd.DataFrame(dict(zip(fields, zip(*got))))

    starts_df = spark.createDataFrame(
        [(s,) for s in page_starts], "sn long"
    ).repartition(num_fetchers)
    fetched = starts_df.mapInPandas(fetch_pages, schema)
    return spark.createDataFrame(first_rows, schema).unionByName(fetched)


def to_bulk_text(df: DataFrame) -> DataFrame:
    """Rows → one ``[%FIELD%]value...`` line per doc — byte-compatible
    with the reference's bulk file (and this repo's S3 reader,
    ``sources/bulk_text.py``)."""
    line = F.concat(
        *[F.concat(F.lit(f"[%{c}%]"), F.coalesce(F.col(c), F.lit(""))) for c in df.columns]
    )
    return df.select(line.alias("value"))
