"""Round-3 additions: kmeans scorer-tier equivalence, the hot-shingle
broadcast-vs-anti-join fallback, and the assertive streaming smokes."""

import pytest

from hadoop_distexec_spark.operators import llmops
from hadoop_distexec_spark.operators.llmops import kmeans
from hadoop_distexec_spark.sources.tables import table

SF = "/root/testdata/sf0.001"


def test_kmeans_scorer_tiers_agree(spark):
    """The vectorized (pandas_udf + BLAS) assignment tier must produce the
    same clustering as the HOF-expression tier: identical assignments and
    per-row distances within float tolerance."""
    e = table(spark, SF, "embeddings").persist()
    try:
        a_hof, c_hof = kmeans(e, scorer="hof")
        a_vec, c_vec = kmeans(e, scorer="pandas")
        hof = {r["vec_id"]: (r["cluster"], r["sq_dist"]) for r in a_hof.collect()}
        vec = {r["vec_id"]: (r["cluster"], r["sq_dist"]) for r in a_vec.collect()}
        assert set(hof) == set(vec)
        for vid, (cl, d) in hof.items():
            assert vec[vid][0] == cl, f"vec_id {vid}: cluster {vec[vid][0]} != {cl}"
            assert abs(vec[vid][1] - d) <= 1e-9 * max(abs(d), 1.0)
        # the final centroid tables agree too (same Lloyd trajectory)
        ch = {r["cluster"]: r["centroid"] for r in c_hof.collect()}
        cv = {r["cluster"]: r["centroid"] for r in c_vec.collect()}
        assert set(ch) == set(cv)
        for cl, cent in ch.items():
            assert cv[cl] == pytest.approx(cent, abs=1e-9)
    finally:
        e.unpersist()


def test_hot_shingle_cap_semantics_and_aqe_sized_join(spark):
    """ADVICE r01 #4: the hot-shingle stop list must not be statically
    broadcast (its bound is |shingles|/MAX_SHINGLE_DF — huge at 100 TB).
    The anti-join carries no broadcast hint — AQE sizes it at runtime —
    and its result must equal the independently-computed df-cap filter."""
    from pyspark.sql import functions as F

    s = llmops._shingles_df(spark, SF).persist()
    try:
        kept = llmops._drop_hot_shingles(s)
        # no static broadcast hint in the optimized logical plan
        logical = kept._jdf.queryExecution().optimizedPlan().toString()
        assert "ResolvedHint" not in logical
        got = sorted(map(tuple, kept.select("doc_id", "shingle").collect()))
        df_counts = {
            r["shingle"]: r["c"]
            for r in s.groupBy("shingle").agg(F.count(F.lit(1)).alias("c")).collect()
        }
        want = sorted(
            (r["doc_id"], r["shingle"])
            for r in s.collect()
            if df_counts[r["shingle"]] <= llmops.MAX_SHINGLE_DF
        )
        assert got == want
        assert got  # the cap keeps almost all shingles; empty would be a bug
    finally:
        s.unpersist()
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_streaming_smokes_are_assertive(spark):
    """The streaming smokes return a one-row zero-mismatch frame and raise
    on stream-vs-batch drift — a broken comparison must not pass silently.
    Run the cheapest one for real, then prove the failure path fires."""
    from hadoop_distexec_spark.streaming import windows

    out = windows.q_stream_dedup_smoke(spark, SF).collect()
    assert len(out) == 1 and out[0]["n_mismatch"] == 0

    with pytest.raises(AssertionError, match="diverges"):
        windows._check_frame(spark, "forced", 10, 9, 1)


def test_bench_emits_json_even_with_broken_query(tmp_path, monkeypatch):
    """BENCH_r02 died on one AnalysisException and produced no artifact.
    bench.main() must always print the JSON line: inject a failing query
    id into HEADLINE and check the artifact still appears, with the error
    recorded per-query and the good timings intact."""
    import io
    import json
    import sys

    import bench

    monkeypatch.setattr(bench, "HEADLINE", ["q_topk", "q_split_train_test"])
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    def boom(spark, sf_dir):
        raise RuntimeError("injected failure")

    from hadoop_distexec_spark import registry

    specs = registry.specs()
    broken = dict(specs)
    broken["q_topk"] = type(specs["q_topk"])("q_topk", boom, None, "broken")
    monkeypatch.setattr(bench.registry, "specs", lambda: broken)
    # keep the tier comparison out of this smoke (it is exercised by the
    # real bench run; here the subject is per-query isolation)
    monkeypatch.setattr(bench, "_bench_assignment_tiers", lambda spark, sf_dir: {})

    buf = io.StringIO()
    monkeypatch.setattr(sys, "stdout", buf)
    bench.main()
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out["metric"] == "headline_queries_total"
    assert "q_topk" in out["errors"] and "injected failure" in out["errors"]["q_topk"]
    assert out["queries"]["q_split_train_test"] >= 0
