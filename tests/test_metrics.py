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


def test_bench_contract_line_fits_driver_tail():
    """The driver's artifact capture keeps only the final 2000 bytes of
    bench.py's stdout (BENCH_r07.json: tail exactly 2000 bytes, parsed
    null) — the contract line printed last must always serialize under
    that, with every registered headline query named, for any plausible
    future headline size."""
    import json
    import sys

    sys.path.insert(0, ".")
    import bench

    for n in (len(bench.HEADLINE) + 19, 120, 200):
        out = {
            "metric": "headline_queries_total",
            "value": 123.456,
            "unit": "sec",
            "sf": 0.1,
            "queries": {f"q_plausibly_long_name_{i:03d}": 0.123 + i * 0.731
                        for i in range(n)},
        }
        compact = bench._compact_contract_line(out)
        line = json.dumps(compact, separators=(",", ":"))
        assert len(line) <= 2000 - 5, (n, len(line))
        parsed = json.loads(line)
        assert parsed["metric"] == "headline_queries_total"
        assert parsed["unit"] == "sec"
        # every query named unless the line explicitly says it dropped some
        if "queries_omitted" not in parsed:
            assert len(parsed["queries"]) == n
