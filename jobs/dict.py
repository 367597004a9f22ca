"""spark-submit job: dictionary management (Q10 dict actions —
info / compile / restore / find; ``ProductNameAnalysisAction.java``
handlers, re-expressed as batch jobs over files + a status table).

    python jobs/dict.py --dicts /path/dicts info
    python jobs/dict.py --dicts /path/dicts compile --status /path/dict_status \\
        --compiled /path/compiled       # also emit binary .dict images
    python jobs/dict.py --dicts /path/restored restore --compiled /path/compiled
    python jobs/dict.py --dicts /path/dicts find --word 노트북

``restore`` is the inverse of ``compile``: it regenerates the text
dictionary files from the compiled binary images (deployment-migration
path; compile → restore → reload is lossless up to comments/order).
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
    ap.add_argument("action", choices=["info", "compile", "restore", "find"])
    ap.add_argument("--status", help="dict_status parquet path (compile)")
    ap.add_argument("--compiled", help="compiled binary images dir (compile/restore)")
    ap.add_argument("--word", help="word to look up (find)")
    args = ap.parse_args()

    from mecab_ko_lucene_analyzer_spark.sources.dictionaries import (
        compile_dictionaries,
        load_dictionary_set,
        restore_dictionaries,
        write_dict_status,
    )

    if args.action == "restore":
        if not args.compiled:
            ap.error("--compiled required for restore")
        written = restore_dictionaries(args.compiled, args.dicts)
        print(json.dumps({"status": "restored", "files": written, "to": args.dicts}))
        return

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
        if not args.status and not args.compiled:
            ap.error("--status and/or --compiled required for compile")
        out = {"status": "applied"}
        if args.compiled:
            out["images"] = compile_dictionaries(args.dicts, args.compiled)
            out["compiled"] = args.compiled
        if args.status:
            from mecab_ko_lucene_analyzer_spark.plans import get_spark

            spark = get_spark(app_name="dict-compile")
            write_dict_status(spark, args.dicts, args.status)
            out["path"] = args.status
            spark.stop()
        print(json.dumps(out))


if __name__ == "__main__":
    main()
