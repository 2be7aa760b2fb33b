"""Round-4 additions (ADVICE r03): kmeans near-tie argmin stability, the
events-ts epoch-unit footer sniff, and the LSH plane-width fail-fast."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hadoop_distexec_spark.operators import llmops
from hadoop_distexec_spark.operators.llmops import _assign_hof, _assign_pandas
from hadoop_distexec_spark.sources.tables import (
    normalize_events_ts,
    sniff_bigint_ts_unit,
)

SF = "/root/testdata/sf0.001"


def _assign_both(spark, vecs, cents):
    vec = spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in enumerate(vecs)],
        "vec_id: long, embedding: array<double>",
    )
    cc = spark.createDataFrame(
        [Row(cluster=i, centroid=c) for i, c in enumerate(cents)],
        "cluster: int, centroid: array<double>",
    )
    hof = {r["vec_id"]: (r["cluster"], r["sq_dist"]) for r in _assign_hof(vec, cc).collect()}
    pan = {r["vec_id"]: (r["cluster"], r["sq_dist"]) for r in _assign_pandas(vec, cc).collect()}
    return hof, pan


def test_assign_pandas_exact_tie_matches_hof(spark):
    """A point exactly equidistant from two centroids must break the tie on
    the lower cluster id in BOTH tiers (ADVICE r03 medium: the BLAS
    expansion's cancellation error could otherwise flip argmin)."""
    hof, pan = _assign_both(
        spark,
        vecs=[[1.0, 0.0], [3.0, 4.0]],
        cents=[[0.0, 0.0], [2.0, 0.0], [4.0, 8.0]],
    )
    assert hof[0] == (0, 1.0)  # exact tie c0/c1 -> lowest id
    assert pan[0] == (0, 1.0)
    assert hof[1] == pan[1]


def test_assign_pandas_near_tie_matches_hof(spark):
    """Near-ties (relative gap ~1e-12, far inside the BLAS expansion's
    ~1e-9 cancellation band) resolve via the exact top-2 re-score to the
    same winner as the HOF tier's exact fold."""
    eps = 1e-12
    hof, pan = _assign_both(
        spark,
        vecs=[[1.0 + eps, 0.0], [1.0 - eps, 0.0]],
        cents=[[0.0, 0.0], [2.0, 0.0]],
    )
    for vid in (0, 1):
        assert pan[vid][0] == hof[vid][0], f"vec {vid}: tiers diverge on a near-tie"
    assert hof[0][0] == 1 and hof[1][0] == 0  # geometry sanity


def test_assign_pandas_single_centroid(spark):
    hof, pan = _assign_both(spark, vecs=[[3.0, 4.0]], cents=[[0.0, 0.0]])
    assert hof[0] == (0, 25.0) and pan[0] == (0, 25.0)


def test_sniff_ts_unit_from_logical_type(tmp_path):
    """TIMESTAMP(NANOS)/(MICROS) logical types state their unit outright."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = 1_700_000_000  # seconds since epoch, ~2023
    for unit, scale in [("ns", 10**9), ("us", 10**6), ("ms", 10**3)]:
        path = str(tmp_path / f"t_{unit}.parquet")
        t = pa.table({"ts": pa.array([base * scale], type=pa.timestamp(unit))})
        pq.write_table(t, path)
        assert sniff_bigint_ts_unit(path) == unit


def test_sniff_ts_unit_from_int64_magnitude(tmp_path):
    """A PLAIN int64 ts (no logical type) is classified by the footer max
    statistic — the dtype sniff alone cannot tell int64 nanos from int64
    micros, and a wrong divisor shifts every event by 1000x (ADVICE r03)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = 1_700_000_000
    for unit, scale in [("ns", 10**9), ("us", 10**6), ("ms", 10**3), ("s", 1)]:
        path = str(tmp_path / f"i_{unit}.parquet")
        pq.write_table(pa.table({"ts": pa.array([base * scale], pa.int64())}), path)
        assert sniff_bigint_ts_unit(path) == unit, unit


def test_normalize_bigint_micros_roundtrip(spark, tmp_path):
    """End-to-end: an int64-micros events file lands on the right instant
    (the old unconditional div-1000 would shift it to 1970)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    micros = 1_700_000_000 * 10**6 + 123_456
    path = str(tmp_path / "events.parquet")
    pq.write_table(pa.table({"ts": pa.array([micros], pa.int64())}), path)
    df = spark.read.parquet(path)
    out = normalize_events_ts(df, unit=sniff_bigint_ts_unit(path))
    [row] = out.select(F.unix_micros("ts").alias("us")).collect()
    assert row["us"] == micros


def test_sniff_ts_unit_fallback(tmp_path):
    """Unreadable path or empty dir falls back to the r01 contract (ns)."""
    assert sniff_bigint_ts_unit(str(tmp_path / "missing.parquet")) == "ns"
    os.makedirs(tmp_path / "empty_dir")
    assert sniff_bigint_ts_unit(str(tmp_path / "empty_dir")) == "ns"


def test_minhash_tiers_find_same_verified_pairs(spark):
    """The xxhash64 production tier and the md5 oracle tier share the
    exact-Jaccard verify step, so on the fixture's high-Jaccard near-dups
    both recover the same pair set (VERDICT r03 #3; a borderline-Jaccard
    pair could in principle differ in band recall — the fixture's dups
    are far above the 0.3 threshold)."""
    md5 = {(r["doc_a"], r["doc_b"]) for r in llmops.minhash_pairs(spark, SF).collect()}
    xx = {(r["doc_a"], r["doc_b"]) for r in llmops.minhash_pairs(spark, SF, hash="xxhash64").collect()}
    assert md5 == xx
    assert md5, "fixture should contain near-dup pairs"


def test_simhash_xxhash_tier_contract(spark):
    """simhash's OUTPUT is a function of its hash (different bit votes =>
    different signatures), so the tiers are not output-equivalent by
    design; the production tier must still honor the schema and the
    hamming bound."""
    out = llmops.simhash_pairs(spark, SF, hash="xxhash64")
    assert out.columns == ["doc_a", "doc_b", "hamming"]
    rows = out.collect()
    assert all(0 <= r["hamming"] <= 6 for r in rows)
    assert all(r["doc_a"] < r["doc_b"] for r in rows)


def test_lsh_oversized_dim_fails_fast(spark, monkeypatch):
    """An embedding wider than the generated plane width must raise, not
    silently null-pad the projection into wrong buckets (ADVICE r03)."""
    monkeypatch.setattr(llmops, "_PLANE_MAX_DIM", 4)  # fixture dim is wider
    with pytest.raises(ValueError, match="_PLANE_MAX_DIM"):
        llmops.lsh_candidates(spark, SF)


# ---------------------------------------------------------------------------
# round-4 wave 2: percentile / SCD-2 / bucketed join / triangles / hybrid
# ---------------------------------------------------------------------------


def test_percentile_matches_numpy(spark):
    """The integer-exact interpolation must agree with numpy's 'linear'
    percentile (the same textbook formula) on every fixture group."""
    import numpy as np

    from hadoop_distexec_spark.operators.relational_ext import q_agg_percentile
    from hadoop_distexec_spark.sources.tables import table

    got = {r["l_returnflag"]: r for r in q_agg_percentile(spark, SF).collect()}
    vals = (
        table(spark, SF, "lineitem")
        .select("l_returnflag", "l_quantity")
        .toPandas()
        .groupby("l_returnflag")["l_quantity"]
    )
    for g, s in vals:
        for p, col in ((25, "p25"), (50, "p50"), (75, "p75")):
            expect = float(np.percentile(s.to_numpy(), p, method="linear"))
            assert got[g][col] == pytest.approx(expect, rel=1e-12), (g, col)
        assert got[g]["median_ok"] is True
        assert got[g]["n"] == len(s)


def test_scd2_interval_invariants(spark):
    """Per (user_id, event_type): intervals chain without gaps or overlap
    (valid_to == next valid_from), exactly one open current row, and no
    two consecutive intervals carry the same value."""
    from collections import defaultdict

    from hadoop_distexec_spark.operators.relational_ext import q_scd2

    rows = q_scd2(spark, SF).collect()
    by_key = defaultdict(list)
    for r in rows:
        by_key[(r["user_id"], r["event_type"])].append(r)
    assert by_key, "no SCD-2 history produced"
    for key, ivs in by_key.items():
        ivs.sort(key=lambda r: r["valid_from_us"])
        currents = [r for r in ivs if r["is_current"]]
        assert len(currents) == 1, key
        assert ivs[-1]["is_current"] and ivs[-1]["valid_to_us"] is None, key
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to_us"] == b["valid_from_us"], key
            assert a["value"] != b["value"], (key, "unchanged value not compressed")


def test_triangle_counts_match_bruteforce(spark):
    """Degree-oriented counting must equal brute-force enumeration on a
    graph with a hub, a clique, and pendant edges."""
    from itertools import combinations

    from hadoop_distexec_spark.operators.llmops import triangle_counts

    # K4 on 0-3, hub 0 also linked to 4,5,6; extra triangle (4,5) edge;
    # pendant 6-7
    edge_list = sorted(
        {(a, b) for a, b in combinations(range(4), 2)}
        | {(0, 4), (0, 5), (0, 6), (4, 5), (6, 7)}
    )
    adj = set(edge_list)
    expected = {}
    for x, y, z in combinations(range(8), 3):
        if (x, y) in adj and (y, z) in adj and (x, z) in adj:
            for v in (x, y, z):
                expected[v] = expected.get(v, 0) + 1
    edges = spark.createDataFrame(edge_list, "va: long, vb: long")
    got = {r["vec_id"]: r["n_tri"] for r in triangle_counts(edges).collect()}
    assert got == expected


def test_hybrid_search_rrf_sanity(spark):
    """Fused list is rrf-descending with doc_id tiebreak; every rrf equals
    the reciprocal-rank formula from its own rank columns; a doc present
    in both modality lists outranks the reciprocal of either alone."""
    from hadoop_distexec_spark.operators.llmops import (
        HYBRID_RRF_K,
        q_hybrid_search,
    )

    rows = q_hybrid_search(spark, SF).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        expect = sum(
            1.0 / (HYBRID_RRF_K + rank)
            for rank in (r["lex_rank"], r["vec_rank"])
            if rank is not None
        )
        assert r["rrf"] == pytest.approx(expect, rel=1e-15)
    keys = [(-r["rrf"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)
    both = [r for r in rows if r["lex_rank"] is not None and r["vec_rank"] is not None]
    if both:
        single_max = 1.0 / (HYBRID_RRF_K + 1)
        assert both[0]["rrf"] > single_max


def test_funnel_stage_ordering_invariants(spark):
    """Stage timestamps must be strictly increasing where present, stage
    must match exactly which timestamps are set, and the per-user result
    must equal a driver-side recompute of the chained-min definition."""
    from hadoop_distexec_spark.operators.relational_ext import q_funnel
    from hadoop_distexec_spark.sources.tables import table

    got = {r["user_id"]: r for r in q_funnel(spark, SF).collect()}
    ev = (
        table(spark, SF, "events")
        .select("user_id", "event_type", F.unix_micros("ts").alias("ts_us"))
        .toPandas()
    )
    assert set(got) == set(ev["user_id"].unique())
    for uid, g in ev.groupby("user_id"):
        def first_after(kind, after=None):
            ts = g[g["event_type"] == kind]["ts_us"]
            if after is not None:
                ts = ts[ts > after]
            return int(ts.min()) if len(ts) else None

        v = first_after("view")
        c = first_after("click", v) if v is not None else None
        p = first_after("purchase", c) if c is not None else None
        r = got[uid]
        assert (r["view_us"], r["click_us"], r["purchase_us"]) == (v, c, p), uid
        expect_stage = (
            3 if p is not None else 2 if c is not None else 1 if v is not None else 0
        )
        assert r["funnel_stage"] == expect_stage, uid
        if p is not None:
            assert v < c < p


def test_retention_offset_zero_equals_cohort_size(spark):
    """Every user is active in their own first week, so the offset-0 cell
    equals the cohort's size and no later cell exceeds it."""
    from collections import Counter

    from hadoop_distexec_spark.operators.relational_ext import (
        _US_PER_DAY,
        q_retention,
    )
    from hadoop_distexec_spark.sources.tables import table

    rows = q_retention(spark, SF).collect()
    ev = (
        table(spark, SF, "events")
        .select("user_id", F.expr(f"unix_micros(ts) div {_US_PER_DAY}").alias("day"))
        .toPandas()
    )
    cohort_sizes = Counter(ev.groupby("user_id")["day"].min())
    zero = {r["cohort_day"]: r["n_users"] for r in rows if r["week_offset"] == 0}
    assert zero == dict(cohort_sizes)
    for r in rows:
        assert r["week_offset"] >= 0
        assert 0 < r["n_users"] <= cohort_sizes[r["cohort_day"]]


def test_scd2_null_value_transitions(spark):
    """value->NULL opens a NULL interval, NULL->value closes it, and a
    history STARTING with NULL is recorded — the IS DISTINCT FROM
    semantics (a naive <> drops the NULL period entirely)."""
    from hadoop_distexec_spark.operators.relational_ext import scd2_intervals

    rows = [
        # key A: A -> NULL -> A (same value resumes after a NULL gap)
        (1, "x", 100, 1, 5.0),
        (1, "x", 200, 2, None),
        (1, "x", 300, 3, 5.0),
        # key B: starts NULL, then a value
        (2, "x", 100, 4, None),
        (2, "x", 200, 5, 7.0),
        # key C: NULL run compresses to one interval
        (3, "x", 100, 6, None),
        (3, "x", 200, 7, None),
    ]
    e = spark.createDataFrame(
        rows, "user_id: long, event_type: string, ts_us: long, event_id: long, value: double"
    )
    got = {
        u: [(r["value"], r["valid_from_us"], r["valid_to_us"], r["is_current"])
            for r in rs]
        for u, rs in __import__("itertools").groupby(
            sorted(scd2_intervals(e).collect(), key=lambda r: (r["user_id"], r["valid_from_us"])),
            key=lambda r: r["user_id"],
        )
    }
    assert got[1] == [(5.0, 100, 200, False), (None, 200, 300, False), (5.0, 300, None, True)]
    assert got[2] == [(None, 100, 200, False), (7.0, 200, None, True)]
    assert got[3] == [(None, 100, None, True)]
