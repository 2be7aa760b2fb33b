"""Round-10 operators: the data-derived degree cap (VERDICT r09 #6).

SCALE.md's r09 cap-sensitivity curve produced a deployment rule — pick
the cap from the cell-size distribution, not from a recall target — and
`auto_degree_cap` wires it into code as the library default for the
capped edge builders. These tests pin the rule's arithmetic against a
brute-force recompute and the law the verdict asked to preserve: on the
natural fixture the auto cap lands at/above the saturation point, so
the capped edge set equals the exact tier's.
"""

from __future__ import annotations

import duckdb

from hadoop_distexec_spark.operators.llmops import (
    DEGREE_CAP,
    auto_degree_cap,
    embed_edges_capped,
    q_dedup_embed,
)
from tests.conftest import SF_SMALL


def _brute_auto_cap(sf_dir: str, floor: int = DEGREE_CAP) -> int:
    p95 = duckdb.connect().execute(
        f"""SELECT percentile_cont(0.95) WITHIN GROUP (ORDER BY m)
            FROM (SELECT label, count(*) m
                  FROM '{sf_dir}/embeddings.parquet' GROUP BY label)"""
    ).fetchone()[0]
    p95 = int(-(-(p95 or 0.0) // 1))
    return max(floor, 1 << p95.bit_length()) if p95 > 0 else floor


def test_auto_degree_cap_matches_brute_force(spark):
    cap = auto_degree_cap(spark, SF_SMALL)
    assert cap == _brute_auto_cap(SF_SMALL)
    # power of two, at or above the floor
    assert cap >= DEGREE_CAP and (cap & (cap - 1)) == 0
    # the fixture's p95 label cell is ~60 members: the rule lands on 64,
    # the exact saturation point SCALE.md measured
    assert cap == 64


def test_auto_cap_preserves_natural_saturation(spark):
    """The law VERDICT r09 #6 requires: with the data-derived cap, the
    capped tier reproduces the exact tier's edge set on the natural
    fixture (cap covers whole cells, so the sliding window enumerates
    every within-cell pair — capped == exact, and still m*cap-bounded
    on any hub tail a bigger corpus grows)."""
    cap = auto_degree_cap(spark, SF_SMALL)
    capped = {
        (r["vec_a"], r["vec_b"])
        for r in embed_edges_capped(spark, SF_SMALL, cap=cap).collect()
    }
    exact = {
        (r["vec_a"], r["vec_b"]) for r in q_dedup_embed(spark, SF_SMALL).collect()
    }
    assert capped == exact
    assert capped  # non-vacuous: the fixture has near-dup pairs


def test_auto_degree_cap_floor_on_degenerate_input(spark):
    # a floor above the fixture's p95-derived cap wins (monotone floor)
    assert auto_degree_cap(spark, SF_SMALL, floor=256) == 256
