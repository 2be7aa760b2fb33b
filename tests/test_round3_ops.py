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


def test_hot_shingle_anti_join_fallback_matches_broadcast(spark, monkeypatch):
    """ADVICE r01 #4: above HOT_BROADCAST_CAP the hot-shingle stop list
    must switch from a broadcast to a shuffle anti-join with identical
    results. Force the fallback by dropping the cap to 0 and compare."""
    s = llmops._shingles_df(spark, SF).persist()
    try:
        kept_bcast = sorted(map(tuple, llmops._drop_hot_shingles(s).collect()))
        monkeypatch.setattr(llmops, "HOT_BROADCAST_CAP", 0)
        kept_shuffle = sorted(map(tuple, llmops._drop_hot_shingles(s).collect()))
    finally:
        s.unpersist()
    assert kept_bcast == kept_shuffle
    assert kept_bcast  # the cap keeps almost all shingles; empty would be a bug


def test_streaming_smokes_are_assertive(spark):
    """The streaming smokes return a one-row zero-mismatch frame and raise
    on stream-vs-batch drift — a broken comparison must not pass silently.
    Run the cheapest one for real, then prove the failure path fires."""
    from hadoop_distexec_spark.streaming import windows

    out = windows.q_stream_dedup_smoke(spark, SF).collect()
    assert len(out) == 1 and out[0]["n_mismatch"] == 0

    with pytest.raises(AssertionError, match="diverges"):
        windows._check_frame(spark, "forced", 10, 9, 1)
