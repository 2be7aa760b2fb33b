"""Round-8 prep wave invariants (operators/audits.py — implemented +
draft-oracle parity-tested in round 7, registration queued for the
round-8 rotation window): count-min-sketch accuracy harness, first/second
half distribution drift in exact ppm, k-anonymity group-size spectrum,
support-pruned market-basket pairs, and sliding-window distinct with a
checked HLL tier."""

import pytest
from pyspark.sql import functions as F

from hadoop_distexec_spark.operators import audits
from hadoop_distexec_spark.sources.tables import table
from tests.conftest import SF_ORACLE, SF_SMALL

WAVE = [
    ("cms_topk", audits.cms_topk, audits.CMS_TOPK_ORACLE),
    ("drift_tvd", audits.drift_tvd, audits.DRIFT_TVD_ORACLE),
    ("k_anonymity", audits.k_anonymity, audits.K_ANONYMITY_ORACLE),
    ("itemset_pairs", audits.itemset_pairs, audits.ITEMSET_PAIRS_ORACLE),
    ("sliding_distinct", audits.sliding_distinct, audits.SLIDING_DISTINCT_ORACLE),
]


def test_audit_wave_draft_oracles_parity(spark):
    """Every audit-wave operator is bit-exact against its draft DuckDB
    twin at sf0.01 BEFORE registration — the same gate the driver runs."""
    from tests.oracle_util import compare, duckdb_conn

    con = duckdb_conn(SF_ORACLE)
    for name, fn, oracle in WAVE:
        compare(fn(spark, SF_ORACLE).toPandas(), con.execute(oracle).fetchdf(), name)
    con.close()


def test_cms_one_sided_bound_for_every_key(spark):
    """The CMS guarantee is one-sided for ALL keys, not just the top-k
    the registered face reports: rebuild the sketch the operator's own
    way and check est >= exact across the full key domain."""
    li = table(spark, SF_ORACLE, "lineitem").select(F.col("l_partkey").alias("key"))
    cnt = li.groupBy("key").agg(F.count(F.lit(1)).alias("cnt"))
    hashed = cnt.select(
        "key",
        "cnt",
        *[audits._cms_bucket(j).alias(f"b{j}") for j in range(audits.CMS_DEPTH)],
    )
    jb = hashed.select(
        "key",
        "cnt",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).cast("int").alias("j"), F.col(f"b{j}").alias("b"))
                    for j in range(audits.CMS_DEPTH)
                ]
            )
        ).alias("jb"),
    ).select("key", "cnt", F.col("jb.j").alias("j"), F.col("jb.b").alias("b"))
    sketch = jb.groupBy("j", "b").agg(F.sum("cnt").alias("bucket_cnt"))
    est = (
        jb.join(sketch, ["j", "b"])
        .groupBy("key", "cnt")
        .agg(F.min("bucket_cnt").alias("est"))
    )
    viol = est.where(F.col("est") < F.col("cnt")).count()
    assert viol == 0


def test_cms_output_shape_and_bound(spark):
    rows = audits.cms_topk(spark, SF_ORACLE).collect()
    assert len(rows) == audits.CMS_TOPK
    for r in rows:
        assert r["bound_ok"] is True
        assert r["cms_est"] >= r["exact_cnt"]
        assert r["overest"] == r["cms_est"] - r["exact_cnt"]


def test_drift_conservation_and_bounds(spark):
    """Every event lands in exactly one bin per feature; ppm shares per
    (feature, half) sum to 1e6 minus at most one integer-floor unit per
    bin; TVD is bounded by [0, 1e6] and constant within a feature."""
    rows = audits.drift_tvd(spark, SF_ORACLE).collect()
    n_events = table(spark, SF_ORACLE, "events").count()
    by_feature = {}
    for r in rows:
        by_feature.setdefault(r["feature"], []).append(r)
    assert set(by_feature) == {"event_type", "value_bin"}
    for feat, rs in by_feature.items():
        assert sum(r["n_before"] + r["n_after"] for r in rs) == n_events
        for col in ("share_before_ppm", "share_after_ppm"):
            s = sum(r[col] for r in rs)
            assert 1_000_000 - len(rs) <= s <= 1_000_000
        tvds = {r["tvd_half_ppm"] for r in rs}
        assert len(tvds) == 1
        (tvd,) = tvds
        assert 0 <= tvd <= 1_000_000
        assert tvd == sum(r["drift_ppm"] for r in rs) // 2
    # 8 value bins configured; every observed bin id is in range
    assert all(
        0 <= int(r["bucket"]) < audits.DRIFT_VALUE_BINS
        for r in by_feature["value_bin"]
    )


def test_k_anonymity_conserves_rows(spark):
    rows = audits.k_anonymity(spark, SF_ORACLE).collect()
    n_cust = table(spark, SF_ORACLE, "customer").count()
    assert sum(r["n_rows"] for r in rows) == n_cust
    for r in rows:
        assert r["n_rows"] == r["n_groups"] * r["k_size"]
        assert r["at_risk"] == (r["k_size"] < audits.K_ANON_THRESHOLD)
    s = sum(r["share_rows_ppm"] for r in rows)
    assert 1_000_000 - len(rows) <= s <= 1_000_000


def test_itemset_pairs_support_laws(spark):
    rows = audits.itemset_pairs(spark, SF_ORACLE).collect()
    assert 0 < len(rows) <= audits.ITEMSET_TOPK
    for r in rows:
        assert r["part_a"] < r["part_b"]
        assert r["sup_a"] >= audits.ITEMSET_MIN_SUPPORT
        assert r["sup_b"] >= audits.ITEMSET_MIN_SUPPORT
        assert audits.ITEMSET_MIN_PAIR <= r["n_co"] <= min(r["sup_a"], r["sup_b"])
        assert 0 < r["jaccard_ppm"] <= 1_000_000


def test_sliding_distinct_window_laws(spark):
    rows = audits.sliding_distinct(spark, SF_ORACLE).collect()
    ev = table(spark, SF_ORACLE, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n_events"] for r in rows) == 2 * n_events
    for r in rows:
        assert r["win_start_s"] % audits.SLIDE_STEP_S == 0
        assert 0 < r["n_users"] <= min(r["n_events"], n_users)
        assert r["hll_within_10pct"] is True


def test_sliding_distinct_hll_flag_holds_at_sf01(spark):
    """The TRUE-flag contract at the bench scale too (sf0.1 cardinalities
    are ~10x the oracle fixture's): a flag that only holds at sf0.01
    would fail the first driver witness after a fixture bump."""
    bad = (
        audits.sliding_distinct(spark, "/root/testdata/sf0.1")
        .where(~F.col("hll_within_10pct"))
        .count()
    )
    assert bad == 0


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_audit_wave_plan_shapes(spark):
    """Docstring shape claims, gated on executed plans: no nested-loop
    joins anywhere except drift_tvd's single whitelisted 1-row stats
    broadcast; itemset_pairs and cms_topk join only by equi-keys and
    carry no static broadcast hints; the itemset head is
    TakeOrderedAndProject (never a global pair sort); k_anonymity joins
    nothing at all."""
    p = _plan(audits.cms_topk(spark, SF_SMALL))
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p, p

    d = audits.drift_tvd(spark, SF_SMALL)
    p = _plan(d)
    assert p.count("BroadcastNestedLoopJoin") <= 1 and "CartesianProduct" not in p, p

    it = audits.itemset_pairs(spark, SF_SMALL)
    assert "ResolvedHint" not in it._jdf.queryExecution().analyzed().toString()
    p = _plan(it)
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p, p
    assert "TakeOrderedAndProject" in p, p

    p = _plan(audits.k_anonymity(spark, SF_SMALL))
    assert "Join" not in p, p

    p = _plan(audits.sliding_distinct(spark, SF_SMALL))
    assert "Join" not in p, p
