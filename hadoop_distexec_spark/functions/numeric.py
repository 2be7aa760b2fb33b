"""Cross-engine-deterministic numeric helpers.

The correctness gate hash-compares Spark results against DuckDB. Floating
point *reductions* (sum/avg over doubles) are order-sensitive and therefore
not reproducible across engines, so every aggregate in this repo follows
these rules:

1. **Sums**: cast the addend to ``DECIMAL(18,4)`` (or wider) *before*
   summing. Decimal arithmetic is exact, so the sum is order-insensitive and
   bit-identical in Spark and DuckDB; the final ``CAST(... AS DOUBLE)`` is
   IEEE round-to-nearest in both engines.
2. **Averages**: decimal sum, then a *double* division by the count —
   single IEEE op, deterministic.
3. **Per-row arithmetic** on doubles is fine: same inputs, same expression
   tree -> identical IEEE results.
4. **Timestamps** never leave a query as raw timestamps — export epoch
   seconds/micros as BIGINT (``unix_timestamp``/``unix_micros`` vs DuckDB
   ``floor(epoch(..))``/``epoch_us``) to sidestep timezone/format drift.
5. **Windows / top-k** always order by a unique tiebreaker key.

Oracle-side (DuckDB) twins of these helpers live inline in each query's
oracle SQL string.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,4)"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-insensitive sum: SUM(CAST(x AS DECIMAL(18,4)))::DOUBLE.

    DuckDB twin: ``CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Deterministic average: decimal sum / count, divided as doubles.

    DuckDB twin:
    ``CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def revenue_expr() -> Column:
    """Exact-decimal lineitem revenue addend: price * (1 - discount).

    DuckDB twin:
    ``CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))``.
    """
    return F.col("l_extendedprice").cast(DEC) * (F.lit(1.0) - F.col("l_discount")).cast(DEC)


# SQL fragments for oracle strings (kept next to their Spark twins above).
SQL_DSUM = "CAST(SUM(CAST({x} AS DECIMAL(18,4))) AS DOUBLE)"
SQL_DAVG = "CAST(SUM(CAST({x} AS DECIMAL(18,4))) AS DOUBLE) / COUNT({x})"
SQL_REVENUE = "CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))"
