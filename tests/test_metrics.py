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


def test_bench_norm_ratios_lane_normalized(tmp_path):
    """norm_ratio self-normalizes by the shared-query MEDIAN raw ratio
    (VERDICT r10 #4): a uniform lane slowdown reads 1.0 per query with
    the whole-lane factor reported once as norm_lane_ratio, a genuine
    single-query regression still stands out, and errored qids are
    excluded. HERMETIC (VERDICT r10 #5): the previous-round artifact is
    a synthetic fixture injected via prev_path — the repo glob is never
    consulted, so driver artifacts landing in the working tree (the
    exact state every round ends in) cannot flip this test."""
    import json
    import sys

    sys.path.insert(0, ".")
    import bench

    prev = {
        "queries": {f"q_{i:02d}": 1.0 + i / 10 for i in range(9)},
        "lane_probe_sec": 0.3,
    }
    prev_path = tmp_path / "BENCH_LOCAL_r42.json"
    prev_path.write_text(json.dumps(prev))

    out = {
        "queries": {k: v * 1.7 for k, v in prev["queries"].items()},
        "lane_probe_sec": 0.51,
        "errors": {"q_00": "boom"},
    }
    out["queries"]["q_08"] = prev["queries"]["q_08"] * 1.7 * 2.0  # real regression
    r = bench._norm_ratios(out, prev_path=str(prev_path))
    assert r["norm_vs"] == "r42"
    assert "q_00" not in r["norm_ratio"]
    assert abs(r["norm_lane_ratio"] - 1.7) < 0.01
    clean = [v for q, v in r["norm_ratio"].items() if q != "q_08"]
    assert clean and all(abs(v - 1.0) < 0.01 for v in clean)
    assert abs(r["norm_ratio"]["q_08"] - 2.0) < 0.01


def test_bench_norm_ratios_target_pinned_to_bench_local(tmp_path, monkeypatch):
    """Target selection: with no CORRECTNESS artifact the latest
    BENCH_LOCAL is used (ADVICE r10 #4's fresh-clone case); once
    CORRECTNESS_rN exists, only BENCH_LOCAL rounds STRICTLY BELOW N are
    eligible — so neither a mid-round CORRECTNESS landing (the r10
    race) nor the current round's own committed local bench (the r11
    review finding: a same-round target self-compares at ~1.0 and hides
    every real regression) can flip or vacate the comparison."""
    import json
    import sys

    sys.path.insert(0, ".")
    import bench

    (tmp_path / "BENCH_LOCAL_r08.json").write_text(json.dumps({"queries": {"q": 2.0}}))
    (tmp_path / "BENCH_LOCAL_r09.json").write_text(json.dumps({"queries": {"q": 1.0}}))
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    monkeypatch.delenv("SPARK_GRAFT_BENCH_PREV", raising=False)
    out = {"queries": {"q": 1.5}}
    r1 = bench._norm_ratios(out)
    assert r1["norm_vs"] == "r09"
    # the fresh-clone fallback cannot rule out a self-compare, and must
    # say so (ADVICE r11 #4)
    assert r1.pop("norm_fresh_fallback") is True
    # the driver's round-10 state: CORRECTNESS_r10 present, and the
    # round's OWN local bench committed — the target must stay r09,
    # never the same-round r10 artifact (and the fallback flag is gone:
    # the corr cap proves the target predates this round)
    (tmp_path / "CORRECTNESS_r09.json").write_text("{}")
    (tmp_path / "CORRECTNESS_r10.json").write_text("{}")
    (tmp_path / "BENCH_LOCAL_r10.json").write_text(json.dumps({"queries": {"q": 1.5}}))
    r2 = bench._norm_ratios(out)
    assert r2["norm_vs"] == "r09" and r2 == r1
    # the env override serves the builder's mid-round refresh lane
    monkeypatch.setenv(
        "SPARK_GRAFT_BENCH_PREV", str(tmp_path / "BENCH_LOCAL_r10.json")
    )
    r3 = bench._norm_ratios(out)
    assert r3["norm_vs"] == "r10" and r3["norm_lane_ratio"] == 1.0


def test_bench_norm_ratios_nonmatching_prev_label(tmp_path):
    """ADVICE r11 #1: an injected prev_path that is not a
    BENCH_LOCAL_r{N}.json must label norm_vs with the real filename, not
    silently fall back to 'r00'."""
    import json
    import sys

    sys.path.insert(0, ".")
    import bench

    prev_path = tmp_path / "custom_target.json"
    prev_path.write_text(json.dumps({"queries": {"q": 1.0}}))
    r = bench._norm_ratios({"queries": {"q": 1.3}}, prev_path=str(prev_path))
    assert r["norm_vs"] == "custom_target.json"
    assert "norm_fresh_fallback" not in r
