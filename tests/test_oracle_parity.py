"""The local correctness gate: every registered query with an oracle must
match DuckDB at sf0.01, mirroring the driver's CORRECTNESS check."""

import pytest

from hadoop_distexec_spark import registry
from tests.conftest import SF_ORACLE
from tests.oracle_util import run_pair

SPECS = registry.specs()
WITH_ORACLE = sorted(qid for qid, s in SPECS.items() if s.oracle)
ROWS_ONLY = sorted(qid for qid, s in SPECS.items() if not s.oracle)


@pytest.mark.parametrize("qid", WITH_ORACLE)
def test_oracle_parity(spark, qid):
    spec = SPECS[qid]
    n = run_pair(spark, qid, spec.fn, spec.oracle, SF_ORACLE)
    assert n >= 0


@pytest.mark.parametrize("qid", ROWS_ONLY)
def test_rows_only_runs(spark, qid):
    spec = SPECS[qid]
    df = spec.fn(spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
