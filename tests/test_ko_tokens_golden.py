"""Regression lock for the Korean analysis chain's Spark output (the
one driver query without a DuckDB oracle): the full token table at
sf0.001, sorted and hashed. Any change to the token stream — provider,
appender, offset, or position semantics — fails here and must be a
deliberate fixture update (with the semantic change explained in the
commit).
"""

import hashlib
from pathlib import Path

FIXTURE = Path(__file__).parent / "fixtures" / "analyze_ko_tokens_sf0001.txt"
SF_DIR = "/root/testdata/sf0.001"


def _table_hash(spark) -> tuple[int, str]:
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __spark_entry__ as entrymod

    df = entrymod.queries()["analyze_ko_tokens"](spark, SF_DIR)
    cols = sorted(df.columns)
    rows = sorted(tuple(repr(r[c]) for c in cols) for r in df.collect())
    digest = hashlib.md5("\n".join("|".join(r) for r in rows).encode()).hexdigest()
    return len(rows), digest


def test_ko_token_table_matches_fixture(spark):
    n_rows, digest = _table_hash(spark)
    assert FIXTURE.exists(), (
        f"fixture missing — record it with: echo '{n_rows} {digest}' > {FIXTURE}"
    )
    want_rows, want_digest = FIXTURE.read_text().split()
    assert n_rows == int(want_rows), f"row count {n_rows} != fixture {want_rows}"
    assert digest == want_digest, (
        "Korean token table changed — if intentional, update the fixture: "
        f"echo '{n_rows} {digest}' > {FIXTURE}"
    )
