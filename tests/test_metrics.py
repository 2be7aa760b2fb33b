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

    # (n, base, step): the 9999-base case makes the real omitted-seconds
    # total serialize WIDER than the 99999.9 placeholder, exercising the
    # post-substitution re-measure loop (ADVICE r09 #4)
    for n, base, step in (
        (len(bench.HEADLINE) + 19, 0.123, 0.731),
        (120, 0.123, 0.731),
        (200, 0.123, 0.731),
        (300, 9999.0, 73.1),
    ):
        out = {
            "metric": "headline_queries_total",
            "value": 123.456,
            "unit": "sec",
            "sf": 0.1,
            "queries": {f"q_plausibly_long_name_{i:03d}": base + i * step
                        for i in range(n)},
            # regression summary rides the line too (VERDICT r09 #8)
            "norm_vs": "r09",
            "norm_ratio": {f"q_plausibly_long_name_{i:03d}": 1.0 + i * 0.01
                           for i in range(n)},
        }
        compact = bench._compact_contract_line(out)
        line = json.dumps(compact, separators=(",", ":"))
        assert len(line) <= 2000 - 5, (n, len(line))
        parsed = json.loads(line)
        assert parsed["metric"] == "headline_queries_total"
        assert parsed["unit"] == "sec"
        assert parsed["norm_vs"] == "r09"
        assert parsed["norm_regressions"] == sum(
            1 for v in out["norm_ratio"].values() if v > 1.25
        )
        # every query named unless the line explicitly says it dropped some
        if "queries_omitted" not in parsed:
            assert len(parsed["queries"]) == n
        else:
            assert parsed["queries_omitted"] == n - len(parsed["queries"])


def test_bench_norm_ratios_lane_normalized():
    """norm_ratio divides out the lane-probe swing: a uniform slowdown
    with a matching probe move reads 1.0; errored qids are excluded."""
    import json
    import sys

    sys.path.insert(0, ".")
    import bench

    prev = json.load(open("BENCH_LOCAL_r09.json"))
    probe_prev = prev.get("lane_probe_sec") or 0.3
    out = {
        "queries": {k: v * 1.7 for k, v in prev["queries"].items()},
        "lane_probe_sec": probe_prev * 1.7,
        "errors": {next(iter(prev["queries"])): "boom"},
    }
    r = bench._norm_ratios(out)
    assert r["norm_vs"].startswith("r")
    assert next(iter(prev["queries"])) not in r["norm_ratio"]
    vals = list(r["norm_ratio"].values())
    assert vals and all(abs(v - 1.0) < 0.01 for v in vals)
