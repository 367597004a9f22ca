"""spark-submit job: dictionary management (Q10 dict actions —
info / compile / reload-status; ``ProductNameAnalysisAction.java``
handlers, re-expressed as batch jobs over files + a status table).

    python jobs/dict.py --dicts /path/dicts info
    python jobs/dict.py --dicts /path/dicts compile --status /path/dict_status
    python jobs/dict.py --dicts /path/dicts find --word 노트북
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dicts", required=True, help="dictionary files directory")
    ap.add_argument("action", choices=["info", "compile", "find"])
    ap.add_argument("--status", help="dict_status parquet path (compile)")
    ap.add_argument("--word", help="word to look up (find)")
    args = ap.parse_args()

    from mecab_ko_lucene_analyzer_spark.sources.dictionaries import (
        load_dictionary_set,
        write_dict_status,
    )

    ds = load_dictionary_set(args.dicts)
    if args.action == "info":
        print(
            json.dumps(
                {
                    "tag_prob": len(ds.tag_prob),
                    "user": len(ds.user),
                    "stop": len(ds.stop),
                    "unit": len(ds.unit),
                    "unit_synonym": len(ds.unit_synonym),
                    "synonym": len(ds.synonym),
                    "space": len(ds.space),
                    "compound": len(ds.compound),
                },
                ensure_ascii=False,
            )
        )
    elif args.action == "find":
        if not args.word:
            ap.error("--word required for find")
        w = args.word
        print(
            json.dumps(
                {
                    "word": w,
                    "tag_prob": [
                        (t.tag.value, t.prob) for t in (ds.tag_prob.find(w) or [])
                    ],
                    "user": w in ds.user,
                    "stop": w in ds.stop,
                    "unit": w in ds.unit,
                    "synonyms": ds.synonym.get(w),
                    "space": ds.space.get(w),
                    "compound": ds.compound.get(w),
                },
                ensure_ascii=False,
            )
        )
    else:  # compile
        if not args.status:
            ap.error("--status required for compile")
        from mecab_ko_lucene_analyzer_spark.plans import get_spark

        spark = get_spark(app_name="dict-compile")
        write_dict_status(spark, args.dicts, args.status)
        print(json.dumps({"status": "applied", "path": args.status}))
        spark.stop()


if __name__ == "__main__":
    main()
