"""Write-time data layout for scan-time data skipping.

At 100 TB the cheapest byte is the one never read: parquet keeps per
row-group min/max statistics, and Spark's scan prunes row groups whose
stats can't satisfy the pushed filter. That only helps if values are
CLUSTERED — a randomly-laid-out table has every row group spanning the
full value range, so nothing prunes.

Two layouts:

- ``sort_layout``: range-partition + sort on one column. Perfect skipping
  on that column's predicates, none on any other.
- ``zorder_layout``: sort on the Morton (Z-order) interleaving of two
  columns' rank-normalized values — the classic multi-dimensional
  clustering (Databricks OPTIMIZE ZORDER, Hudi/Iceberg z-ordering).
  Filters on EITHER column prune well, at the cost of each being a
  little worse than a dedicated single-column sort.

Everything is plain DataFrame ops (rank windows + bit-interleave
expressions, all codegen); the write is an ordinary parquet write, so the
layout composes with partitioning/bucketing. Spark-side statistics do the
skipping — nothing here is engine-specific.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

_ZBITS = 16  # bits per dimension in the Morton code (32-bit combined key)


def _morton_expr(a, b, bits: int = _ZBITS):
    """Interleave the low ``bits`` bits of two non-negative long columns:
    result bit 2i = a's bit i, bit 2i+1 = b's bit i. Pure shift/and/or
    expressions — whole-stage codegen, no UDF."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_key(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Append a ``_zkey`` Morton key built from the two columns'
    rank-normalized values.

    Rank normalization (percent_rank scaled to 2^bits buckets) makes the
    interleaving distribution-free: skewed or unbounded domains still
    spread uniformly across the key space, which is what makes min/max
    pruning effective. The two rank windows are global sorts of (value)
    pairs — at 100 TB swap in ``F.ntile`` over a sampled range partitioner
    or approx-quantile bucketing (same key contract, no global window);
    the sandbox-scale window keeps the construction exact and testable.
    """
    ra = F.percent_rank().over(W.orderBy(F.col(col_a)))
    rb = F.percent_rank().over(W.orderBy(F.col(col_b)))
    scale = (1 << _ZBITS) - 1
    qa = F.floor(ra * scale).cast("long")
    qb = F.floor(rb * scale).cast("long")
    return df.withColumn("_zkey", _morton_expr(qa, qb))


def zorder_layout(df: DataFrame, col_a: str, col_b: str, n_files: int = 8) -> DataFrame:
    """Return df re-laid-out so that writing it yields files clustered on
    the Z-order of (col_a, col_b): range-partition by the Morton key, sort
    within partitions, drop the key. Each output file then covers a small
    rectangle of the (col_a, col_b) value space, so min/max stats prune on
    either column's predicates."""
    keyed = zorder_key(df, col_a, col_b)
    return (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )


def sort_layout(df: DataFrame, col: str, n_files: int = 8) -> DataFrame:
    """Single-column clustering: range partition + in-partition sort.
    The baseline layout zorder_layout trades against."""
    return df.repartitionByRange(n_files, col).sortWithinPartitions(col)
