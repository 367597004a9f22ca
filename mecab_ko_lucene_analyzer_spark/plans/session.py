"""SparkSession construction with the engine's physical-execution
defaults (SURVEY.md §4): AQE on (runtime re-plan + skew-join splitting),
Arrow batching sized for large page strings, shuffle partitions sized
to cores (overridable per deployment).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark"]


def get_spark(
    app_name: str = "mecab-ko-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_max_records: int = 2048,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    # heap scales with task threads (2 GB/core, floor 8 GB): a local[4N]
    # session is the single-box stand-in for 4N executors, and executors
    # bring their own heaps — a flat heap would give local[16] a quarter
    # of the per-core memory that 4 independent local[4] JVMs enjoy
    # (measured ~5% build throughput on exactly that comparison).
    if master.startswith("local[") and master[6:-1].isdigit():
        task_threads = int(master[6:-1])
    else:
        task_threads = cpus
    default_mem = f"{max(8, 2 * task_threads)}g"
    shuffle_partitions = shuffle_partitions or max(cpus * 2, 8)
    return (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_max_records))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", default_mem))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
