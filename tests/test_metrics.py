"""Observation-based metrics ride the existing job (no second scan)."""

from pyspark.sql import functions as F

from hadoop_distexec_spark.functions.metrics import observed
from hadoop_distexec_spark.sources.tables import table
from tests.conftest import SF_SMALL


def test_observed_default_metrics(spark):
    o = table(spark, SF_SMALL, "orders")
    df, obs = observed(o.select("o_orderkey", "o_custkey"), "orders_obs")
    n = df.count()
    got = obs.get
    assert got["rows"] == n == 1500
    assert got["nulls_o_orderkey"] == 0


def test_observed_custom_metrics_match_agg(spark):
    li = table(spark, SF_SMALL, "lineitem")
    df, obs = observed(
        li,
        "li_obs",
        F.count(F.lit(1)).alias("executed"),
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("qty"),
    )
    df.write.format("noop").mode("overwrite").save()
    expect = li.agg(
        F.count(F.lit(1)).alias("executed"),
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("qty"),
    ).collect()[0]
    got = obs.get
    assert got["executed"] == expect["executed"]
    assert got["qty"] == expect["qty"]
