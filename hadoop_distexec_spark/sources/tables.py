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


def sniff_bigint_ts_unit(path: str, col: str = "ts") -> str:
    """Decide the epoch unit ('ns'/'us'/'ms'/'s') of a timestamp column
    that Spark will read as bigint, from the parquet FOOTER only (no data
    read, works for streaming sources too):

      1. a TIMESTAMP logical type states its unit outright;
      2. a plain int64 (no logical type) is classified by the magnitude of
        the footer's max statistic — nanos since epoch are ~1e18, micros
        ~1e15, millis ~1e12 (ADVICE r03: the Spark-side dtype sniff alone
        cannot distinguish these, and dividing micros by 1000 would
        silently shift every event by 1000x).

    Falls back to 'ns' (the observed r01 fixture encoding) if the footer
    is unreadable or carries no statistics.
    """
    import glob
    import os

    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
            if not parts:
                return "ns"
            path = parts[0]
        pf = pq.ParquetFile(path)
        field = pf.schema_arrow.field(col)
        if pa.types.is_timestamp(field.type):
            return field.type.unit
        # plain int64: classify by footer max statistic
        idx = pf.schema_arrow.get_field_index(col)
        for rg in range(pf.metadata.num_row_groups):
            stats = pf.metadata.row_group(rg).column(idx).statistics
            if stats is not None and stats.has_min_max:
                mx = abs(int(stats.max))
                if mx >= int(1e17):
                    return "ns"
                if mx >= int(1e14):
                    return "us"
                if mx >= int(1e11):
                    return "ms"
                return "s"
    except Exception:
        pass
    return "ns"


_TS_FROM_UNIT = {
    "ns": lambda c: F.timestamp_micros(F.expr(f"{c} div 1000")),
    "us": lambda c: F.timestamp_micros(F.col(c)),
    "ms": lambda c: F.timestamp_millis(F.col(c)),
    "s": lambda c: F.timestamp_seconds(F.col(c)),
}


def normalize_events_ts(df: DataFrame, unit: str = "ns") -> DataFrame:
    """Normalize the events table's ts column to TimestampType (UTC).

    The fixture's ts physical type has changed across driver versions:
      - TIMESTAMP(NANOS): Spark reads it as int64 nanos (via
        spark.sql.legacy.parquet.nanosAsLong) -> truncate to micros,
        matching DuckDB's epoch_us, and restore TimestampType;
      - TIMESTAMP_MICROS isAdjustedToUTC=0: Spark reads TIMESTAMP_NTZ
        -> reinterpret as a UTC instant (session TZ is pinned UTC);
      - TIMESTAMP_MICROS isAdjustedToUTC=1: already TimestampType.
    Sniff the dtype instead of assuming one encoding. ``unit`` is the
    epoch unit to assume for a bigint-read column — callers that know the
    file path should pass ``sniff_bigint_ts_unit(path)`` (the dtype alone
    cannot distinguish int64 nanos from int64 micros; ADVICE r03).
    """
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        if unit not in _TS_FROM_UNIT:
            raise ValueError(f"unknown epoch unit {unit!r} for bigint ts")
        return df.withColumn("ts", _TS_FROM_UNIT[unit]("ts"))
    if ts_type == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df  # already TimestampType


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}")
    _ensure_session_confs(spark)
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if name == "events":
        df = normalize_events_ts(df, unit=sniff_bigint_ts_unit(path))
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
