"""Bucketed co-located joins: the join plan must contain no shuffle
(Exchange) on either side."""

from pyspark.sql import functions as F

from hadoop_distexec_spark.sources.bucketing import bucketize_for_join
from hadoop_distexec_spark.sources.tables import table
from tests.conftest import SF_SMALL


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    # warehouse.dir is a static conf; the session default (spark-warehouse/
    # under cwd, gitignored) is fine for the test tables.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try:
        li = table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_extendedprice")
        o = table(spark, SF_SMALL, "orders").select("o_orderkey", "o_orderpriority")
        lb, ob = bucketize_for_join(spark, li, o, "l_orderkey", "o_orderkey", n_buckets=4)
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:800]}"
        # and it is still correct
        expected = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert joined.count() == expected
        # aggregation on the bucket key also avoids the shuffle
        agg = lb.groupBy("l_orderkey").agg(F.sum("l_extendedprice"))
        agg_plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in agg_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")
