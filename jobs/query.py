"""spark-submit job: query a built index (analyze → AST → block-max
WAND / AST executor → top-k with URLs).

    spark-submit jobs/query.py --index /path/index --query "검색 엔진" -k 10
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", required=True)
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--disjunctive", action="store_true")
    ap.add_argument("--explain", action="store_true")
    ap.add_argument(
        "--max-driver-df",
        type=int,
        default=1_000_000,
        help="df above which a term's blocks are scored executor-side "
        "instead of collected to the driver (query/router.py)",
    )
    args = ap.parse_args()

    from mecab_ko_lucene_analyzer_spark.analysis.dictionary import AnalyzerOption
    from mecab_ko_lucene_analyzer_spark.engine import SearchEngine
    from mecab_ko_lucene_analyzer_spark.plans import get_spark

    spark = get_spark(app_name="query")
    engine = SearchEngine(
        spark, args.index, AnalyzerOption(), max_driver_df=args.max_driver_df
    )
    if args.explain:
        print(engine.explain_query(args.query))
    hits = engine.search(args.query, k=args.k, conjunctive=not args.disjunctive)
    print(json.dumps(hits, ensure_ascii=False, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
