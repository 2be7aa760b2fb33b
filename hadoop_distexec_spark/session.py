"""SparkSession factory tuned for the engine.

Local runs use local[N]; the same configs are what we would set on a real
cluster (AQE on, UTC session timezone for oracle parity, Arrow for the
Pandas-UDF slow path). Shuffle partitions default to the local core count —
on a 1000-executor cluster this would be set to ~2-3x total cores instead.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "hadoop_distexec_spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # cap per-worker BLAS/OpenMP threads BEFORE any JVM/worker spawns:
    # Spark already runs one Python worker per core, so a numpy linked
    # against a default-threaded BLAS oversubscribes cores^2 (measured as
    # bimodal 0.5s-vs-13s pandas_udf timings under load). Workers inherit
    # this env from the driver process chain. setdefault: an explicit
    # operator-level override still wins.
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # fixture tables are single ~20MB parquet files; the default 128MB
        # split size would scan them on one core, so the LOCAL default is
        # 8MB to keep fixture scans parallel. This is a scale-dependent
        # knob (guide §6): at 100 TB small splits multiply the map-task
        # count feeding every shuffle (guide §2.2), so production sets
        # SPARK_GRAFT_MAX_PARTITION_BYTES to 512m-1g; parameterised here
        # so the same code serves both without editing a constant.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # events.parquet stores TIMESTAMP(NANOS); Spark has no nanosecond
        # timestamp type, so read as int64 nanos and convert to micros at
        # the source (sources/tables.py) — same truncation DuckDB applies.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # single-writer file sinks in the pipe executor require no
        # speculative re-execution, like the reference
        # (DistExec.java:443-445); this is Spark's default, pinned here.
        .config("spark.speculation", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
