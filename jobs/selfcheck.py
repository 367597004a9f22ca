"""Contract self-check at the DRIVER'S scale: run every
``__spark_entry__.queries()`` entry at sf0.01 (or ``--sf-dir``) and
compare against its ``oracle_sql()`` DuckDB result with the same
rows + column-names + order-insensitive-values comparison the grading
driver performs — then write the per-query record to
``CONTRACT_SELFCHECK.json``.

Why this exists: the pytest harness (``tests/test_entry_contract.py``)
runs the identical comparison at sf0.001, but differences that only
appear with more data — ties, rounding, bucket boundaries — surface
exactly at the driver's sf0.01. Queries the driver has never sampled
get their hard check here, committed as an artifact.

Run::

    python jobs/selfcheck.py [--sf-dir /root/testdata/sf0.01] \
        [--out CONTRACT_SELFCHECK.json] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import json
import math
import numbers
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _normalize(v):
    # type-tagged like the driver's value hash: 36 != 36.0
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
    # key=repr: a NULL next to a number yields None vs ("i", x) tuple
    # positions that are not mutually orderable — plain sorted() raises
    # TypeError and records a spurious FAIL (r5 advice). repr is a
    # total, deterministic order over the normalized forms; equality of
    # the sorted lists is unchanged for equal multisets.
    return sorted(
        (tuple(_normalize(r[c]) for c in cols) for r in rows), key=repr
    )


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=str(REPO / "CONTRACT_SELFCHECK.json"))
    ap.add_argument(
        "--only", default="", help="comma-separated query subset"
    )
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("contract-selfcheck")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = sorted(queries)
    if args.only:
        keep = {n.strip() for n in args.only.split(",") if n.strip()}
        names = [n for n in names if n in keep]

    results: dict[str, dict] = {}
    n_fail = 0
    for name in names:
        t0 = time.time()
        rec: dict = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sdf = queries[name](spark, args.sf_dir)
            srows = [r.asDict() for r in sdf.collect()]
            rec["spark_rows"] = len(srows)
            oracle = oracles.get(name)
            if oracle is None:
                # rows-only tier (the driver's weaker check)
                rec["rows_match"] = True
            else:
                ddf = con.sql(oracle).df()
                rec["oracle_rows"] = len(ddf)
                rec["schema_match"] = sorted(sdf.columns) == sorted(
                    ddf.columns
                )
                rec["rows_match"] = len(srows) == len(ddf)
                if rec["schema_match"]:
                    cols = sorted(sdf.columns)
                    rec["hash_match"] = _value_set(
                        srows, cols
                    ) == _value_set(ddf.to_dict("records"), cols)
        except Exception as exc:  # noqa: BLE001 — recorded, not fatal
            rec["err"] = f"{type(exc).__name__}: {exc}"[:500]
        rec["secs"] = round(time.time() - t0, 2)
        ok = (
            rec["err"] is None
            and rec["rows_match"] is not False
            and rec["schema_match"] is not False
            and rec["hash_match"] is not False
        )
        if not ok:
            n_fail += 1
        results[name] = rec
        print(
            f"{'PASS' if ok else 'FAIL'} {name} "
            f"({rec['secs']}s, rows={rec['spark_rows']})",
            flush=True,
        )

    out = {
        "sf_dir": args.sf_dir,
        "n_queries": len(names),
        "n_fail": n_fail,
        "results": results,
    }
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(f"\n{len(names) - n_fail}/{len(names)} green -> {args.out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
