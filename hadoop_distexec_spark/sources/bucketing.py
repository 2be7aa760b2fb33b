"""Bucketed tables: co-located, shuffle-free joins.

At 100 TB the dominant cost of a big-big join is shuffling both sides.
Bucketing pre-shuffles once at write time: both tables hash-partitioned
into the same number of buckets on the join key, so every later join on
that key reads matching buckets side by side — no Exchange in the plan
(tests/test_bucketing.py asserts exactly that).

Bucketed writes go through the session catalog (``saveAsTable``); the
warehouse location defaults to Spark's ``spark.sql.warehouse.dir``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist df as a bucketed (and optionally per-bucket sorted) table.
    Sorting within buckets additionally removes the Sort step from later
    sort-merge joins."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table_name)


def bucketize_for_join(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_buckets: int = 8,
    prefix: str = "bkt",
) -> tuple[DataFrame, DataFrame]:
    """Write both sides bucketed on their join keys and return the
    catalog-backed DataFrames; joining them on the keys is shuffle-free."""
    lt, rt = f"{prefix}_left", f"{prefix}_right"
    write_bucketed(left, lt, left_key, n_buckets)
    write_bucketed(right, rt, right_key, n_buckets)
    return spark.table(lt), spark.table(rt)
