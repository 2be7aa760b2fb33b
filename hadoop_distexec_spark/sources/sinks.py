"""Table sinks: partitioned parquet with pruning, plus the engine's
file-sink conventions.

The reference's only sink is the per-file destination tree
(ExecFilesMapper); an analytics engine also needs table sinks whose layout
pays off at read time. ``write_partitioned`` lays data out hive-style so
later reads with a partition predicate scan only matching directories —
the 100 TB version of "don't read what you don't need" (verified by
tests/test_sinks.py asserting PartitionFilters in the read plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet write. Partition columns should be
    low-cardinality (date, category); everything else stays in the row
    groups where min/max stats + dictionary filters do the pruning."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def orders_by_year(spark: SparkSession, sf_dir: str, out_path: str) -> None:
    """Example layout: orders partitioned by order year."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "order_year", F.year("o_orderdate")
    )
    write_partitioned(o, out_path, ["order_year"])


def read_partition_pruned(spark: SparkSession, path: str, year: int) -> DataFrame:
    """Read back with a partition predicate — Catalyst prunes directories
    before any file is opened (PartitionFilters in the scan node)."""
    return spark.read.parquet(path).filter(F.col("order_year") == year)
