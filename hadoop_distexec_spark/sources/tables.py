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


def _ensure_session_confs(spark: SparkSession) -> None:
    """The engine's queries may run inside a caller-provided SparkSession
    (the driver contract passes one in). Two session confs are
    correctness-critical and runtime-settable, so pin them here instead of
    trusting the caller's builder:

    - UTC session timezone: year()/date_trunc()/unix_timestamp() over the
      fixture timestamps must read them as the UTC instants the oracle
      sees, not shifted into a machine-local zone;
    - nanosAsLong: events.parquet stores TIMESTAMP(NANOS), which Spark
      otherwise refuses (PARQUET_TYPE_ILLEGAL).
    """
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # read-only conf in some environments; session.py already set them


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the events table's ts column to TimestampType (UTC).

    The fixture's ts physical type has changed across driver versions:
      - TIMESTAMP(NANOS): Spark reads it as int64 nanos (via
        spark.sql.legacy.parquet.nanosAsLong) -> truncate to micros,
        matching DuckDB's epoch_us, and restore TimestampType;
      - TIMESTAMP_MICROS isAdjustedToUTC=0: Spark reads TIMESTAMP_NTZ
        -> reinterpret as a UTC instant (session TZ is pinned UTC);
      - TIMESTAMP_MICROS isAdjustedToUTC=1: already TimestampType.
    Sniff the dtype instead of assuming one encoding.
    """
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if ts_type == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df  # already TimestampType


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}")
    _ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(df)
    # Every temporal column reads as one type regardless of the fixture's
    # physical encoding: TIMESTAMP_NTZ columns (orders.o_orderdate,
    # lineitem.l_shipdate as of the r02 fixture regeneration) reinterpret
    # as UTC instants — a value-preserving no-op under the pinned UTC
    # session TZ today, and the guard that keeps a future encoding flip
    # from changing query semantics (the r02 events lesson, generalized).
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df
