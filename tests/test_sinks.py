"""Partitioned sink + partition pruning proof."""

from hadoop_distexec_spark.sources.sinks import orders_by_year, read_partition_pruned
from tests.conftest import SF_SMALL


def test_partitioned_write_and_prune(spark, tmp_path):
    out = str(tmp_path / "orders_part")
    orders_by_year(spark, SF_SMALL, out)
    df = read_partition_pruned(spark, out, 1996)
    # correctness: only 1996 rows
    years = [r["order_year"] for r in df.select("order_year").distinct().collect()]
    assert years == [1996]
    # plan: the filter must be a PartitionFilter on the scan, pruning
    # directories before any file read
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "order_year" in plan.split("PartitionFilters", 1)[1][:200]
