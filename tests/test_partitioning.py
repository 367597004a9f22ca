"""fan_out (round-6): size-gated scan fan-out for under-split inputs.

Contract under test:
* small file-backed relations are repartitioned to a multiple of the
  session's core count (so single-row-group parquet inputs stop running
  Python stages on one core);
* the gate is INPUT BYTES vs maxPartitionBytes x cores — above it the
  relation passes through UNTOUCHED (no shuffle is ever added at real
  scale);
* non-file relations pass through untouched;
* rows are preserved exactly (round-robin repartition only moves them).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from mecab_ko_lucene_analyzer_spark.functions.partitioning import (
    _parse_bytes,
    fan_out,
)


def test_parse_bytes_spark_size_strings():
    assert _parse_bytes("134217728") == 128 * 1024 * 1024
    assert _parse_bytes("134217728b") == 128 * 1024 * 1024
    assert _parse_bytes("128m") == 128 * 1024 * 1024
    assert _parse_bytes("128MB") == 128 * 1024 * 1024
    assert _parse_bytes("1g") == 1 << 30


def test_small_file_input_is_fanned_out(spark, tmp_path):
    path = str(tmp_path / "small.parquet")
    spark.range(0, 1000).select(
        "id", F.concat(F.lit("t"), F.col("id").cast("string")).alias("text")
    ).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    out = fan_out(df)
    cores = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == 2 * cores
    # rows preserved exactly
    assert sorted(r["id"] for r in out.collect()) == list(range(1000))


def test_bytes_per_part_sizing(spark, tmp_path):
    """byte-proportional mode: partitions = clamp(bytes / bytes_per_part,
    min(8, cores), parts_per_core x cores)."""
    path = str(tmp_path / "bp.parquet")
    spark.range(0, 2000).select(
        "id", F.concat(F.lit("x"), F.col("id").cast("string")).alias("text")
    ).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    import os as _os

    total = sum(
        _os.path.getsize(f"{path}/{f}")
        for f in _os.listdir(path)
        if f.endswith(".parquet")
    )
    cores = spark.sparkContext.defaultParallelism
    # huge bytes_per_part -> floor of min(8, cores)
    out = fan_out(df, bytes_per_part=1 << 30)
    assert out.rdd.getNumPartitions() == min(8, cores)
    # tiny bytes_per_part -> ceiling of parts_per_core * cores
    out = fan_out(df, bytes_per_part=1)
    assert out.rdd.getNumPartitions() == 2 * cores
    # in-between: ceil(total / bpp)
    bpp = max(1, total // 10)
    expect = max(min(8, cores), min(2 * cores, -(-total // bpp)))
    assert fan_out(df, bytes_per_part=bpp).rdd.getNumPartitions() == expect


def test_large_input_passes_through(spark, tmp_path):
    path = str(tmp_path / "big.parquet")
    spark.range(0, 100).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    # shrink the gate so this tiny file counts as "big": above the
    # threshold fan_out must NOT touch the plan
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1b")
    try:
        assert fan_out(df) is df
    finally:
        spark.conf.unset("spark.sql.files.maxPartitionBytes")


def test_non_file_relation_passes_through(spark):
    df = spark.range(0, 10)
    assert fan_out(df) is df


def test_ngram_pack_ids_rows_identical(spark, tmp_path):
    """pack_ids=True (single-long pair keys + complete-mode aggregate)
    must emit exactly the rows and schema of the generic path."""
    from mecab_ko_lucene_analyzer_spark.functions.dedup import (
        ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [
            (i, "a b c d e f g h i j")
            for i in range(6)
        ]
        + [(6, "a b c x y z w q r s"), (7, "unrelated text entirely here")],
        "doc_id long, text string",
    )
    packed = ngram_jaccard_pairs(docs, min_common=2, pack_ids=True)
    generic = ngram_jaccard_pairs(docs, min_common=2, pack_ids=False)
    assert packed.schema == generic.schema
    rows_p = sorted(map(tuple, packed.collect()))
    rows_g = sorted(map(tuple, generic.collect()))
    assert rows_p == rows_g
    assert rows_p  # non-degenerate: the identical docs do share shingles
