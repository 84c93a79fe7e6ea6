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


def iceberg_conf(catalog: str = "local",
                 warehouse: str = "/tmp/iceberg-warehouse",
                 catalog_type: str = "hadoop") -> dict[str, str]:
    """Spark conf wiring an Iceberg catalog (public Iceberg-Spark keys).

    Cluster usage -- the one-flag path promised by sources.read_transcripts:

        spark = get_spark(extra_conf=iceberg_conf("lake", "s3://bkt/wh"))
        df = read_transcripts(spark, "lake.db.transcripts")

    Requires the iceberg-spark-runtime jar on the classpath (e.g.
    ``--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>``);
    ``iceberg_available()`` reports whether this environment has it.
    ``catalog_type`` is ``hadoop`` (filesystem warehouse) or ``hive``/
    ``rest`` per the public Iceberg catalog docs."""
    return {
        "spark.sql.extensions":
            "org.apache.iceberg.spark.extensions."
            "IcebergSparkSessionExtensions",
        f"spark.sql.catalog.{catalog}":
            "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": catalog_type,
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }


def iceberg_available() -> bool:
    """True when an iceberg-spark-runtime jar sits on the default
    classpath (SPARK_HOME/jars) -- the gate for the integration test."""
    import glob

    try:
        from pyspark.find_spark_home import _find_spark_home

        home = _find_spark_home()
    except Exception:
        return False
    return bool(glob.glob(
        os.path.join(home, "jars", "iceberg-spark-runtime*.jar")
    ))


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
