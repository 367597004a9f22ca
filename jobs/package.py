"""Build the ``--py-files`` archive for cluster submission.

    python jobs/package.py [--out mecab_ko_lucene_analyzer_spark.zip]

Produces a zip of the ``mecab_ko_lucene_analyzer_spark`` package
(source only, no caches) that every job under ``jobs/`` references:

    spark-submit --py-files mecab_ko_lucene_analyzer_spark.zip \\
        jobs/build_index.py --input ... --output ...

The zip root contains the package directory itself, so executors can
``import mecab_ko_lucene_analyzer_spark`` directly from the archive.
"""

from __future__ import annotations

import argparse
import zipfile
from pathlib import Path


def build_archive(out: str) -> int:
    root = Path(__file__).resolve().parents[1]
    pkg = root / "mecab_ko_lucene_analyzer_spark"
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for f in sorted(pkg.rglob("*.py")):
            zf.write(f, f.relative_to(root))
            n += 1
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="mecab_ko_lucene_analyzer_spark.zip")
    args = ap.parse_args()
    n = build_archive(args.out)
    print(f"wrote {args.out} ({n} modules)")


if __name__ == "__main__":
    main()
