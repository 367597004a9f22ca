"""spark-submit job: analyze text (Q10 analyze / multi-analyze actions).

    python jobs/analyze.py --text "검색엔진은 한국어 문서를 처리한다"
    python jobs/analyze.py --text "삼성 노트북 SL-M2029" --chain product --dicts /path/dicts
    python jobs/analyze.py --file queries.txt --mode keyword

No SparkSession needed — analysis is the pure-Python chain the UDFs
host; this is the reference's `_analysis-product-name?action=analyze`
as a CLI.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--text", action="append", default=[])
    ap.add_argument("--file", help="one text per line (multi-analyze)")
    ap.add_argument("--chain", default="mecab", choices=["mecab", "product"])
    ap.add_argument("--mode", default="standard", choices=["standard", "keyword", "similarity"])
    ap.add_argument("--compound-noun-min-length", type=int, default=3)
    ap.add_argument("--for-query", action="store_true")
    ap.add_argument("--dicts", help="dictionary dir (product chain)")
    args = ap.parse_args()

    texts = list(args.text)
    if args.file:
        texts += [ln.strip() for ln in open(args.file, encoding="utf-8") if ln.strip()]
    if not texts:
        ap.error("--text or --file required")

    if args.chain == "product":
        from mecab_ko_lucene_analyzer_spark.analysis.product import (
            ProductAnalyzerOption,
            ProductDictionarySet,
            ProductNameAnalyzer,
        )

        if args.dicts:
            from mecab_ko_lucene_analyzer_spark.sources.dictionaries import (
                load_dictionary_set,
            )

            dicts = load_dictionary_set(args.dicts)
        else:
            dicts = ProductDictionarySet()
        analyzer = ProductNameAnalyzer(
            dicts, ProductAnalyzerOption(use_for_query=args.for_query)
        )
        for t in texts:
            print(json.dumps({"text": t, "tokens": analyzer.analyze(t)}, ensure_ascii=False))
    else:
        from mecab_ko_lucene_analyzer_spark.analysis.tokenizer import token_records

        for t in texts:
            toks = token_records(t, args.mode, args.compound_noun_min_length)
            print(json.dumps({"text": t, "tokens": toks}, ensure_ascii=False))


if __name__ == "__main__":
    main()
