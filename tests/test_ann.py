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
