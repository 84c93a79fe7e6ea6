"""SparkSession factory tuned for this engine.

Defaults follow the public Spark tuning guidance for local-mode testing while
keeping every knob cluster-appropriate: AQE on (runtime re-planning, skew-join
splitting, partition coalescing), Arrow enabled for the pandas-UDF fast path,
UTC session timezone (oracle comparisons), and shuffle partitions sized to
cores rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "languagedetection-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] -> N; at cluster scale this is executors*cores*2-3,
        # but AQE coalescing makes the initial number less critical.
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = cpus if n in ("*", "") else int(n)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # ship the package to Python workers (the --py-files artifact); without
    # this, workers fail with ModuleNotFoundError when the driver's cwd is
    # not the repo root.
    from .packaging import ship_package

    ship_package(spark.sparkContext)
    return spark
