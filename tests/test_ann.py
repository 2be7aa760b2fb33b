"""ANN quality gates: the approximate similarity paths must stay both
approximately-right (recall floor vs the exact brute force) and cheap
(candidate set a fraction of the corpus)."""

from pyspark.sql import functions as F

from hadoop_distexec_spark import registry
from tests.conftest import SF_ORACLE

SPECS = registry.specs()


def test_lsh_recall_floor(spark):
    exact = SPECS["q_sim_topk"].fn(spark, SF_ORACLE).select("q_id", "c_id")
    approx = SPECS["q_sim_lsh"].fn(spark, SF_ORACLE).select("q_id", "c_id")
    n_exact = exact.count()
    hits = approx.intersect(exact).count()
    assert n_exact > 0
    assert hits / n_exact >= 0.2, f"LSH recall collapsed: {hits}/{n_exact}"


def test_ivf_recall_floor(spark):
    exact = SPECS["q_sim_topk"].fn(spark, SF_ORACLE).select("q_id", "c_id")
    approx = SPECS["q_sim_ivf"].fn(spark, SF_ORACLE).select("q_id", "c_id")
    hits = approx.intersect(exact).count()
    assert hits / exact.count() >= 0.2, "IVF recall collapsed"


def test_lsh_deterministic(spark):
    a = SPECS["q_sim_lsh"].fn(spark, SF_ORACLE).orderBy("q_id", "rnk").collect()
    b = SPECS["q_sim_lsh"].fn(spark, SF_ORACLE).orderBy("q_id", "rnk").collect()
    assert a == b


def _lsh_point(spark, exact, n_corpus, n_planes, probe_bits):
    """(recall@10, scan fraction) for one LSH parameter point."""
    from hadoop_distexec_spark.operators.llmops import lsh_candidates, lsh_topk

    approx = lsh_topk(spark, SF_ORACLE, n_planes, probe_bits).select("q_id", "c_id")
    recall = approx.intersect(exact).count() / exact.count()
    n_cand = (
        lsh_candidates(spark, SF_ORACLE, n_planes, probe_bits)
        .select("q_id", "vec_id").distinct().count()
    )
    n_queries = exact.select("q_id").distinct().count()
    return recall, n_cand / (n_queries * n_corpus)


def test_lsh_tradeoff_curve_monotone(spark):
    """Guard against silent recall regressions as parameters move (VERDICT
    r01 next-round #9): more probing => candidate set and recall both grow
    monotonically; more planes => candidate set shrinks. All points must
    keep scan fraction < 1 (otherwise LSH degenerated to brute force)."""
    from hadoop_distexec_spark.sources.tables import table

    exact = SPECS["q_sim_topk"].fn(spark, SF_ORACLE).select("q_id", "c_id")
    exact = exact.localCheckpoint(eager=True)  # reused 6x below
    n_corpus = table(spark, SF_ORACLE, "embeddings").count()

    # sweep probe radius at fixed planes
    probe_pts = [_lsh_point(spark, exact, n_corpus, 5, pb) for pb in (0, 1, 2)]
    recalls = [p[0] for p in probe_pts]
    fractions = [p[1] for p in probe_pts]
    assert recalls == sorted(recalls), f"recall not monotone in probe_bits: {recalls}"
    assert fractions == sorted(fractions), f"scan not monotone in probe_bits: {fractions}"
    assert recalls[0] > 0, "zero-probe recall collapsed"
    assert fractions[-1] < 1.0, "probing degenerated to brute force"

    # sweep planes at fixed probe radius: finer buckets => smaller scans
    plane_fracs = [_lsh_point(spark, exact, n_corpus, np_, 1)[1] for np_ in (3, 5, 7)]
    assert plane_fracs == sorted(plane_fracs, reverse=True), (
        f"scan fraction must shrink as planes grow: {plane_fracs}"
    )
