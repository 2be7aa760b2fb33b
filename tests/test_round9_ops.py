"""Round-9 invariants: the r10-candidate draft oracles for the two
still-unregistered capped graph consumers (triangle_count_capped,
label_prop_capped) are bit-exact against their Spark tiers at sf0.01 —
the same pre-registration gate every prior wave passed — plus the laws
that tie them to the r09-registered capped edge builders. Registration
is deliberately deferred: the registry sits at 198 ids against the
enacted attested-latest-3 policy's ~4x50 = 200-id steady-state witness
capacity (SURVEY §2.10 r09 rows), so the next wave needs either a larger
driver window or the next policy notch first."""

from hadoop_distexec_spark.operators import llmops, pipeline
from tests.conftest import SF_ORACLE


def test_r10_capped_draft_oracles_parity(spark):
    """triangle_count_capped / label_prop_capped are bit-exact against
    their draft DuckDB twins at sf0.01 BEFORE registration — the twins
    reuse the registered capped-window SQL fragments, so the edge policy
    cannot drift between the registered builders and these drafts."""
    from tests.oracle_util import compare, duckdb_conn

    con = duckdb_conn(SF_ORACLE)
    for name, fn, oracle in [
        (
            "triangle_count_capped",
            llmops.triangle_count_capped,
            llmops.TRIANGLE_COUNT_CAPPED_ORACLE,
        ),
        (
            "label_prop_capped",
            pipeline.label_prop_capped,
            pipeline.LABEL_PROP_CAPPED_ORACLE,
        ),
    ]:
        compare(fn(spark, SF_ORACLE).toPandas(), con.execute(oracle).fetchdf(), name)
    con.close()


def test_capped_drafts_reuse_registered_fragments():
    """The draft oracles must embed the registered capped-window SQL
    byte-for-byte (one definition of the candidate policy): the label
    cells fragment and the window core of q_dedup_embed_capped's oracle
    appear verbatim inside both drafts."""
    cells = llmops._CAPPED_CELLS_LABEL_SQL
    assert cells in llmops.TRIANGLE_COUNT_CAPPED_ORACLE
    assert cells in pipeline.LABEL_PROP_CAPPED_ORACLE
    spec_oracle = None
    from hadoop_distexec_spark import registry

    registry._load_modules()
    spec_oracle = registry.specs()["q_dedup_embed_capped"].oracle
    assert cells in spec_oracle
