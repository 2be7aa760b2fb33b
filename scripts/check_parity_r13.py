#!/usr/bin/env python
"""Round-13 optimization gate: run one or more registered query ids
against their DuckDB oracles at sf0.001 AND sf0.01 (bit-exact compare,
tests/oracle_util.compare) before any optimized query is committed.

    python scripts/check_parity_r13.py <qid> [<qid> ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from hadoop_distexec_spark import registry  # noqa: E402
from hadoop_distexec_spark.session import get_spark  # noqa: E402
from tests.oracle_util import run_pair  # noqa: E402

SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")


def main() -> None:
    qids = sys.argv[1:]
    assert qids, "usage: check_parity_r13.py <qid> [...]"
    spark = get_spark("parity_r13")
    specs = registry.specs()
    for qid in qids:
        spec = specs[qid]
        assert spec.oracle, f"{qid} has no oracle"
        for sf in SFS:
            n = run_pair(spark, qid, spec.fn, spec.oracle, sf)
            print(f"{qid} @ {os.path.basename(sf)}: {n} rows bit-exact")
    print("ALL GREEN")


if __name__ == "__main__":
    main()
