"""Fixture-table loaders.

All queries read the driver's parquet tables through these helpers so that
column pruning and predicate pushdown reach the parquet scan (the reader is
plain ``spark.read.parquet``; Catalyst handles pushdown). At 100 TB these
would be partitioned/bucketed external tables — the query code is agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ts is TIMESTAMP(NANOS) in the parquet; Spark reads it as int64
        # nanos (spark.sql.legacy.parquet.nanosAsLong, see session.py).
        # Truncate to micros — the same thing DuckDB's epoch_us does — and
        # restore a proper TimestampType column.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
