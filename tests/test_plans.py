"""Plan-shape regression tests: the physical plans the engine promises
(broadcast dims, pushed filters, pruned scans, partial top-k) must not
silently regress."""

from hadoop_distexec_spark import registry
from tests.conftest import SF_ORACLE

SPECS = registry.specs()


def _plan(spark, qid):
    return SPECS[qid].fn(spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()


def test_broadcast_join_stays_broadcast(spark):
    plan = _plan(spark, "q_join_broadcast")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "q_agg_groupby")
    assert "PushedFilters" in plan
    i = plan.find("PushedFilters")
    assert "l_shipdate" in plan[i : i + 200]


def test_column_pruning(spark):
    plan = _plan(spark, "q_join_multi")
    i = plan.find("ReadSchema")
    # the lineitem scan must read only the three needed columns
    assert "l_orderkey" in plan[i : i + 200]
    assert "l_shipdate" not in plan[i : i + 200]


def test_topk_uses_partial_topk(spark):
    plan = _plan(spark, "q_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no global sort node


def test_agg_is_two_phase(spark):
    plan = _plan(spark, "q_agg_groupby")
    # partial (map-side) + final hash aggregate
    assert plan.count("HashAggregate") >= 2
