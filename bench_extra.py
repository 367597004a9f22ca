"""Round-6 optimization harness (guide §1.4): isolate each headline
query with the noop sink, best-of-N timing, optional explain capture.

NOT the graded bench — ``bench.py`` is frozen; this file exists so the
optimization round can measure query-by-query without touching it.

Usage:
    python bench_extra.py [--sf /root/testdata/sf1.0] [--reps 2] \
        [--queries ngram_jaccard_pairs,minhash_near_dup] [--explain-dir plans/r06] \
        [--suffix _before]

Prints one JSON line: {"sf": ..., "queries": {name: best_sec}, "first": {...}}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "postings_tf",
    "term_stats",
    "bm25_topk",
    "dedup_exact",
    "ngram_jaccard_pairs",
    "ann_cosine_topk",
    "minhash_near_dup",
    "analyze_ko_tokens",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--queries", default=",".join(HEADLINE))
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    from mecab_ko_lucene_analyzer_spark.plans import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 8),
    )
    import __spark_entry__ as entrymod
    import pyspark.sql.functions as F

    names = [n for n in args.queries.split(",") if n]
    qs = entrymod.queries()

    if not args.no_warm:
        # same generic warm-context bring-up shape as bench.py (excluded
        # from timings): python workers, codegen, shuffle, parquet reader
        from mecab_ko_lucene_analyzer_spark.functions import analyze_udf

        cores = spark.sparkContext.defaultParallelism
        warm = spark.range(0, 4 * cores, numPartitions=2 * cores).select(
            F.col("id").cast("string").alias("text")
        )
        warm.select(analyze_udf()("text")).write.format("noop").mode("overwrite").save()
        toy = spark.range(0, 512, numPartitions=8).select(
            "id",
            F.concat(F.lit("w"), (F.col("id") % 37).cast("string")).alias("w"),
            F.array_repeat(
                F.concat(F.lit("t"), (F.col("id") % 11).cast("string")), 4
            ).alias("arr"),
        )
        toy_path = f"/tmp/bench_extra_warm_toy_{os.getpid()}.parquet"
        toy.write.mode("overwrite").parquet(toy_path)
        tiny = spark.read.parquet(toy_path)
        dims = tiny.groupBy("w").agg(F.count("*").alias("c"))
        (
            tiny.select(
                "id",
                "w",
                F.explode(F.filter(F.col("arr"), lambda x: x != F.lit(""))).alias("t"),
                F.xxhash64("w").alias("h64"),
                F.md5(F.col("w")).alias("h"),
            )
            .join(F.broadcast(dims), "w")
            .groupBy("t")
            .agg(F.count("*").alias("n"), F.sum("c").alias("s"))
            .orderBy(F.desc("n"), F.asc("t"))
            .limit(16)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    if args.explain_dir:
        os.makedirs(args.explain_dir, exist_ok=True)
        for name in names:
            df = qs[name](spark, args.sf)
            with open(
                os.path.join(args.explain_dir, f"{name}{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ))

    out, first = {}, {}
    for _ in range(args.reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            first.setdefault(name, dt)
            if name not in out or dt < out[name]:
                out[name] = dt
            spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf": args.sf, "queries": out, "first": first,
                      "total_best": round(sum(out.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
