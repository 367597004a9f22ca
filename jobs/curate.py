"""spark-submit job: training-corpus curation pipeline.

    spark-submit --py-files mecab_ko_lucene_analyzer_spark.zip \
        jobs/curate.py --input /path/documents_parquet \
        --output /path/curated \
        --dedup minhash --sample "ko=1.0,en=0.5" --default-fraction 0.1

One pass over a ``documents``-shaped table ``(doc_id, text, lang, ...)``:

1. **exact dedup** — drop byte-identical re-crawls, keep the min doc_id.
2. **near-dup dedup** (``--dedup minhash``) — MinHash-LSH candidate
   pairs → connected components → keep each cluster's canonical
   (min doc_id) member. ``--dedup exact`` skips this stage;
   ``--dedup jaccard`` uses the exact shingle baseline (small corpora).
3. **stratified sample** — deterministic per-language mixing; the keep
   decision is a pure hash of doc_id, so reruns and retries select the
   same corpus.

Every stage is a Catalyst plan (no Python in the row path); the output
is written through the table-format seam (parquet path or Iceberg
catalog identifier).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def parse_fractions(spec: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for part in spec.split(","):
        if not part.strip():
            continue
        k, v = part.split("=")
        out[k.strip()] = float(v)
    return out


def curate(
    docs,
    dedup: str = "minhash",
    fractions: dict[str, float] | None = None,
    default_fraction: float = 1.0,
    min_common: int = 5,
):
    """documents DataFrame → curated DataFrame (same columns)."""
    import pyspark.sql.functions as F

    from mecab_ko_lucene_analyzer_spark.functions.dedup import (
        dedup_clusters,
        exact_duplicates,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )
    from mecab_ko_lucene_analyzer_spark.functions.text import stratified_sample

    # 1. exact: anti-join the non-canonical members of identical-text groups
    dupes = exact_duplicates(docs)
    docs = docs.withColumn("_h", F.md5("text"))
    docs = (
        docs.join(
            F.broadcast(dupes.select(F.col("text_hash").alias("_h"), "canonical_doc_id")),
            "_h",
            "left",
        )
        .filter(
            F.col("canonical_doc_id").isNull()
            | (F.col("doc_id") == F.col("canonical_doc_id"))
        )
        .drop("_h", "canonical_doc_id")
    )
    # 2. near-dup clusters → keep canonical member per cluster
    if dedup in ("minhash", "jaccard"):
        pairs = (
            minhash_lsh_pairs(docs)
            if dedup == "minhash"
            else ngram_jaccard_pairs(docs, min_common=min_common)
        )
        members = dedup_clusters(pairs)
        drop = members.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
        docs = docs.join(drop, "doc_id", "left_anti")
    # 3. deterministic stratified mixing
    if fractions:
        docs = stratified_sample(docs, fractions, default_fraction=default_fraction)
    return docs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet path or catalog table")
    ap.add_argument("--output", required=True, help="parquet path or catalog table")
    ap.add_argument("--dedup", default="minhash", choices=["exact", "minhash", "jaccard"])
    ap.add_argument("--sample", default="", help='per-lang fractions, e.g. "ko=1.0,en=0.5"')
    ap.add_argument("--default-fraction", type=float, default=1.0)
    ap.add_argument("--min-common", type=int, default=5, help="jaccard threshold")
    args = ap.parse_args()

    from mecab_ko_lucene_analyzer_spark.plans import get_spark
    from mecab_ko_lucene_analyzer_spark.sources import read_table, write_table

    spark = get_spark(app_name="curate")
    docs = read_table(spark, args.input)
    kept = curate(
        docs,
        dedup=args.dedup,
        fractions=parse_fractions(args.sample),
        default_fraction=args.default_fraction,
        min_common=args.min_common,
    )
    write_table(kept, args.output)
    n_in, n_out = docs.count(), read_table(spark, args.output).count()
    print(f"curated {n_in} -> {n_out} docs ({args.dedup} dedup"
          + (f", sample {args.sample}" if args.sample else "") + ")")
    spark.stop()


if __name__ == "__main__":
    main()
