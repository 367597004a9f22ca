"""Vectorized analyzer UDFs — the whole A1–A10 chain as one Arrow batch
function (no per-row Python API: one ``pandas_udf`` call analyzes a full
Arrow batch of documents; SURVEY.md §2.5 "UDF surface").

The analysis itself is pure Python per document (it is a sequential
automaton over a morpheme lattice — the same boundary the reference
crosses via JNI per document, ``MeCabKoTokenizer.java:134-139``), but
batching is Arrow-columnar and the lattice provider is a per-executor
singleton, so the per-batch overhead is one FFI hop, not one per row.
"""

from __future__ import annotations

import pandas as pd

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import Column, DataFrame
from pyspark.sql.functions import pandas_udf

from ..analysis.tokenizer import get_lattice_provider, token_records

__all__ = ["TOKEN_SCHEMA", "analyze_udf", "tokens_table"]

#: per-token struct emitted by the analyzer (SURVEY.md §1.1 Spark mapping)
TOKEN_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType(), False),
            T.StructField("type", T.StringType(), False),
            T.StructField("pos", T.StringType(), True),
            T.StructField("semantic_class", T.StringType(), True),
            T.StructField("position", T.IntegerType(), False),
            T.StructField("pos_len", T.IntegerType(), False),
            T.StructField("start_offset", T.IntegerType(), False),
            T.StructField("end_offset", T.IntegerType(), False),
        ]
    )
)


def _analyze_series(
    texts: pd.Series, mode: str, compound_noun_min_length: int
) -> pd.Series:
    provider = get_lattice_provider()  # executor-process singleton
    return texts.map(
        lambda t: token_records(
            t or "", mode, compound_noun_min_length, provider=provider
        )
    )


def analyze_udf(mode: str = "standard", compound_noun_min_length: int = 3):
    """Build the analyzer ``pandas_udf`` for one of the three presets
    (standard | keyword | similarity)."""
    def fn(texts: pd.Series) -> pd.Series:
        return _analyze_series(texts, mode, compound_noun_min_length)

    return pandas_udf(fn, TOKEN_SCHEMA)


def tokens_table(
    pages: DataFrame,
    doc_id: Column | str = "doc_id",
    text: Column | str = "text",
    mode: str = "standard",
    compound_noun_min_length: int = 3,
) -> DataFrame:
    """``webpages`` → exploded token table
    ``(doc_id, term, type, position, start_offset, end_offset)``.

    The explode happens *after* the UDF so each document crosses the
    Arrow boundary once; Catalyst prunes unused struct fields.
    """
    udf = analyze_udf(mode, compound_noun_min_length)
    doc_col = F.col(doc_id) if isinstance(doc_id, str) else doc_id
    text_col = F.col(text) if isinstance(text, str) else text
    return (
        pages.select(doc_col.alias("doc_id"), udf(text_col).alias("tokens"))
        .select("doc_id", F.explode("tokens").alias("t"))
        .select(
            "doc_id",
            F.col("t.term").alias("term"),
            F.col("t.type").alias("type"),
            F.col("t.position").alias("position"),
            F.col("t.start_offset").alias("start_offset"),
            F.col("t.end_offset").alias("end_offset"),
        )
    )
