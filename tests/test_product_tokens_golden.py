"""Regression lock for the product-name chain's Spark output (A11–A23
under the driver contract): the full ``product_tokens`` table at
sf0.001, sorted and hashed — the same fixture pattern that gates
``analyze_ko_tokens``. Any change to the parsing rules, sub-entry
emission, unit handling, or offsets fails here and must be a deliberate
fixture update (with the semantic change explained in the commit)."""

import hashlib
from pathlib import Path

FIXTURE = Path(__file__).parent / "fixtures" / "product_tokens_sf0001.txt"
SF_DIR = "/root/testdata/sf0.001"


def _table_hash(spark) -> tuple[int, str]:
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __spark_entry__ as entrymod

    df = entrymod.queries()["product_tokens"](spark, SF_DIR)
    cols = sorted(df.columns)
    rows = sorted(tuple(repr(r[c]) for c in cols) for r in df.collect())
    digest = hashlib.md5("\n".join("|".join(r) for r in rows).encode()).hexdigest()
    return len(rows), digest


def test_product_token_table_matches_fixture(spark):
    n_rows, digest = _table_hash(spark)
    assert FIXTURE.exists(), (
        f"fixture missing — record it with: echo '{n_rows} {digest}' > {FIXTURE}"
    )
    want_rows, want_digest = FIXTURE.read_text().split()
    assert n_rows == int(want_rows), f"row count {n_rows} != fixture {want_rows}"
    assert digest == want_digest, (
        "product token table changed — if intentional, update the fixture: "
        f"echo '{n_rows} {digest}' > {FIXTURE}"
    )
