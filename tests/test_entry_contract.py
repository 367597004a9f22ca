"""Self-check of the driver contract: every ``queries()`` entry runs at
sf0.001 and, where an oracle exists, matches DuckDB on row count, column
names, and order-insensitive values — the same comparison the driver
performs at sf0.01."""

import math
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(v):
    # type-tagged: the driver's value hash distinguishes 36 from 36.0
    # (round-1 token_count lesson), so int-vs-float must FAIL here too
    import numbers

    if isinstance(v, bool):
        return v
    if isinstance(v, numbers.Integral):
        return ("i", int(v))
    if isinstance(v, numbers.Real):
        v = float(v)
        if math.isnan(v):
            return "nan"
        return ("f", round(v, 6))
    return v


def _value_set(rows, cols):
    return sorted(tuple(_normalize(r[c]) for c in cols) for r in rows)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"doc_id", "score"}
    assert len(rows) > 0  # flagship query should actually hit documents


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs_and_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    srows = sdf.collect()
    oracle = entrymod.oracle_sql().get(name)
    if oracle is None:
        assert len(srows) >= 0  # rows-only check
        return
    ddf = duck.sql(oracle).df()
    assert sorted(sdf.columns) == sorted(ddf.columns), name
    cols = sorted(sdf.columns)
    spark_vals = _value_set([r.asDict() for r in srows], cols)
    duck_vals = _value_set(ddf.to_dict("records"), cols)
    assert len(spark_vals) == len(duck_vals), f"{name}: row count"
    assert spark_vals == duck_vals, f"{name}: values differ"
