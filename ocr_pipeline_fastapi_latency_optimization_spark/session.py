"""SparkSession factory with scale-appropriate defaults.

Local mode is the sandbox stand-in for a multi-executor cluster; every
knob here is chosen to behave the same way at 1000 executors: AQE for
runtime re-planning (shuffle coalescing + skew-join splitting), Arrow
batching to bound Python-worker memory, UTC session time for oracle
comparability, shuffle partitions sized to cores (overridable).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ocr_pipeline_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    builder = SparkSession.builder
    # respect an externally-chosen master (spark-submit --master sets the
    # MASTER env var; SparkConf may carry spark.master from defaults) —
    # unconditionally forcing local[] here would silently demote a
    # cluster submission to driver-local execution
    from pyspark import SparkConf

    if not os.environ.get("MASTER") and not SparkConf().contains("spark.master"):
        builder = builder.master(f"local[{cpus}]")
    builder = (
        builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "12g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
