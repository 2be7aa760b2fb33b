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
from tests.conftest import SF_ORACLE, SF_SMALL


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


# ---------------------------------------------------------------------------
# round-10 registration wave: phash, dedup-rate curve, cell compactness,
# sampled-quantile eval, LSH band curve (bit-exact oracles live in the
# registry and are exercised by test_oracle_parity; these pin laws and
# brute-force recomputes).
# ---------------------------------------------------------------------------


def _brute_phash_pairs(sf_dir: str):
    import hashlib  # noqa: F401 (parity with other brute harnesses)

    import duckdb
    import numpy as np

    from hadoop_distexec_spark.operators.multimodal import (
        PHASH_HAM_T,
        PHASH_MAX_DF,
        PHASH_SIDE,
    )

    rows = duckdb.connect().execute(
        f"SELECT doc_id, encode(text) FROM '{sf_dir}/documents.parquet' "
        "WHERE octet_length(encode(text)) > 0"
    ).fetchall()
    n_px = PHASH_SIDE * PHASH_SIDE
    hashes = {}
    for doc_id, blob in rows:
        blob = bytes(blob)
        reps = -(-n_px // len(blob))
        px = np.frombuffer((blob * reps)[:n_px], dtype=np.uint8).astype(np.int64)
        bits = (n_px * px > px.sum()).astype(np.uint8)
        packed = np.packbits(bits)
        hashes[doc_id] = [int(packed[2 * k]) * 256 + int(packed[2 * k + 1]) for k in range(4)]
    from collections import Counter

    df = Counter((k, v) for h in hashes.values() for k, v in enumerate(h))
    kept = {
        d: [(k, v) for k, v in enumerate(h) if df[(k, v)] <= PHASH_MAX_DF]
        for d, h in hashes.items()
    }
    buckets: dict = {}
    for d, bands in kept.items():
        for kv in bands:
            buckets.setdefault(kv, []).append(d)
    pairs = {}
    for members in buckets.values():
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                lo, hi = min(a, b), max(a, b)
                ham = sum(bin(x ^ y).count("1") for x, y in zip(hashes[lo], hashes[hi]))
                if ham <= PHASH_HAM_T:
                    pairs[(lo, hi)] = ham
    return pairs


def test_multimodal_phash_brute_force(spark):
    from hadoop_distexec_spark.operators.multimodal import multimodal_phash

    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in multimodal_phash(spark, SF_SMALL).collect()
    }
    assert got == _brute_phash_pairs(SF_SMALL)
    assert got  # non-vacuous: the fixture has near-dup docs


def test_dedup_rate_curve_laws(spark):
    from hadoop_distexec_spark.operators.llmops import (
        dedup_rate_curve,
        q_dedup_ngram,
    )

    rows = {r["t10"]: r for r in dedup_rate_curve(spark, SF_SMALL).collect()}
    assert set(rows) == set(range(1, 10))
    for t in range(2, 10):
        # monotone: raising the threshold never adds pairs or docs
        assert rows[t]["n_pairs"] <= rows[t - 1]["n_pairs"]
        assert rows[t]["n_docs_covered"] <= rows[t - 1]["n_docs_covered"]
    # t=0.1 is exactly q_dedup_ngram's registered cutoff
    assert rows[1]["n_pairs"] == q_dedup_ngram(spark, SF_SMALL).count()


def test_cell_compactness_float_reference(spark):
    import duckdb
    import numpy as np

    from hadoop_distexec_spark.operators.llmops import cell_compactness

    got = {r["label"]: r for r in cell_compactness(spark, SF_SMALL).collect()}
    raw = duckdb.connect().execute(
        f"SELECT label, embedding FROM '{SF_SMALL}/embeddings.parquet' "
        "WHERE embedding IS NOT NULL"
    ).fetchall()
    cells: dict = {}
    for label, emb in raw:
        cells.setdefault(label, []).append(np.asarray(emb, dtype=np.float64))
    assert set(got) == set(cells)
    for label, vecs in cells.items():
        x = np.stack(vecs)
        m = len(vecs)
        assert got[label]["m"] == m
        s = x.sum(axis=0)
        ref_pair = (s @ s - (x * x).sum()) / (m * (m - 1))
        assert abs(got[label]["mean_pair_dot"] - ref_pair) < 1e-5
        assert abs(got[label]["mean_self_dot"] - (x * x).sum() / m) < 1e-5
        # identity sanity: pairwise mean is far below self energy on
        # random-ish cells, and sum_norm2/norm2_of_sum are consistent
        assert got[label]["sum_norm2"] > 0


def test_quantile_sample_eval_bounded_error(spark):
    from hadoop_distexec_spark.operators.audits import quantile_sample_eval

    rows = {r["quantile"]: r for r in quantile_sample_eval(spark, SF_SMALL).collect()}
    assert set(rows) == {"p50", "p90", "p99"}
    for r in rows.values():
        assert r["n_sampled"] > 50  # the sample actually materialized
        # ~250-doc sample: quantile error should sit well under 10%
        assert r["err_ppm"] < 100000, r


def test_lsh_band_curve_laws(spark):
    from hadoop_distexec_spark.operators.llmops import lsh_band_curve

    rows = {r["decile"]: r for r in lsh_band_curve(spark, SF_SMALL).collect()}
    assert rows  # sample is non-empty
    total_pairs = sum(r["n_pairs"] for r in rows.values())
    n_docs = int(round((1 + (1 + 8 * total_pairs) ** 0.5) / 2))
    assert n_docs * (n_docs - 1) // 2 == total_pairs  # full C(n,2) universe
    for d, r in rows.items():
        assert 0 <= r["n_cand"] <= r["n_pairs"]
        assert r["cand_rate_ppm"] == r["n_cand"] * 1000000 // r["n_pairs"]
    # the curve's two ends behave: disjoint pairs almost never collide,
    # near-identical pairs almost always do (theory: 25 ppm vs 998816)
    assert rows[0]["cand_rate_ppm"] < 5000
    if 9 in rows:
        assert rows[9]["cand_rate_ppm"] > 900000


# ---------------------------------------------------------------------------
# substring_runs (library tier, r11 registration candidate)
# ---------------------------------------------------------------------------


def _brute_substring_runs(sf_dir: str):
    """Pure-Python mirror of the operator contract: positional 3-word
    shingles, the COUNT(*)<=MAX_SHINGLE_DF positional stop rule, shared
    hits on alignment diagonals, maximal consecutive runs >= MIN_RUN."""
    import collections

    import duckdb as dk

    from hadoop_distexec_spark.operators.llmops import (
        MAX_SHINGLE_DF,
        MIN_SUBSTR_RUN,
        SHINGLE_K,
    )

    rows = dk.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    ps = []
    for doc_id, text in rows:
        t = text.strip().split()
        for p in range(len(t) - SHINGLE_K + 1):
            ps.append((doc_id, p + 1, " ".join(t[p : p + SHINGLE_K])))
    df = collections.Counter(sh for _, _, sh in ps)
    by_sh = collections.defaultdict(list)
    for doc_id, p, sh in ps:
        if df[sh] <= MAX_SHINGLE_DF:
            by_sh[sh].append((doc_id, p))
    diag_hits = collections.defaultdict(set)
    for sh, occ in by_sh.items():
        for da, pa in occ:
            for db, pb in occ:
                if da < db:
                    diag_hits[(da, db, pa - pb)].add(pa)
    out = {}
    for (da, db, _diag), pas in diag_hits.items():
        pas = sorted(pas)
        run = 1
        runs = []
        for prev, cur in zip(pas, pas[1:]):
            if cur == prev + 1:
                run += 1
            else:
                runs.append(run)
                run = 1
        runs.append(run)
        for r in runs:
            if r >= MIN_SUBSTR_RUN:
                mx, n, tot = out.get((da, db), (0, 0, 0))
                out[(da, db)] = (max(mx, r), n + 1, tot + r)
    return {
        k: (mx, mx + SHINGLE_K - 1, n, tot) for k, (mx, n, tot) in out.items()
    }


def test_substring_runs_brute_force(spark):
    from hadoop_distexec_spark.operators.llmops import substring_runs

    got = {
        (r["doc_a"], r["doc_b"]): (
            r["max_run_shingles"],
            r["max_run_words"],
            r["n_runs"],
            r["total_run_shingles"],
        )
        for r in substring_runs(spark, SF_SMALL).collect()
    }
    want = _brute_substring_runs(SF_SMALL)
    assert got == want
    assert len(got) > 0, "vacuous: fixture must contain planted clone spans"
    # the fixture's bimodal gap: every surviving run is well above chance
    assert min(mx for mx, _, _, _ in got.values()) >= 4


def test_substring_runs_draft_oracle_parity(spark):
    """Registration gate: the draft DuckDB twin is bit-exact at sf0.01."""
    from hadoop_distexec_spark.operators.llmops import (
        SUBSTRING_RUNS_ORACLE,
        substring_runs,
    )
    from tests.oracle_util import run_pair

    n = run_pair(
        spark, "substring_runs", substring_runs, SUBSTRING_RUNS_ORACLE, SF_ORACLE
    )
    assert n > 0


# ---------------------------------------------------------------------------
# ivf_pq_recall (library tier, r11 registration candidate)
# ---------------------------------------------------------------------------


def test_ivf_pq_oracle_embeds_registered_fragments():
    """The draft oracle must carry the REGISTERED tiers' CTE text
    verbatim — the IVF probe chain and the PQ quantizer chain — so the
    composition cannot drift from what q_sim_ivf / q_pq_recall witness."""
    from hadoop_distexec_spark.operators.llmops import (
        _IVF_TOPK_CTE,
        _PQ_SHARED_CTES,
        IVF_PQ_RECALL_ORACLE,
        PQ_RECALL_ORACLE,
    )

    assert _IVF_TOPK_CTE in IVF_PQ_RECALL_ORACLE
    assert _PQ_SHARED_CTES in IVF_PQ_RECALL_ORACLE
    assert _PQ_SHARED_CTES in PQ_RECALL_ORACLE
    # the slice must have captured the full quantizer chain
    for cte in ("subs AS", "cb0 AS", "cb1 AS", "cn2 AS", "lut AS", "num AS"):
        assert cte in _PQ_SHARED_CTES, cte


def test_ivf_pq_full_probe_degenerates_to_flat_pq(spark):
    """Saturation law: probing EVERY cell must reproduce the flat PQ
    harness exactly — same per-query recall rows — with the scan share
    pinned at 1e6 ppm (the composition's loss is then pure quantizer).
    Uses the PRIVATE _ivf_pq_recall_at: the public entry point pins
    nprobe to the oracle's baked-in constant (ADVICE r10 #3)."""
    from hadoop_distexec_spark.operators.llmops import _ivf_pq_recall_at, pq_recall

    full = {
        r["q_id"]: r
        for r in _ivf_pq_recall_at(spark, SF_SMALL, nprobe=10_000).collect()
    }
    flat = {r["q_id"]: r for r in pq_recall(spark, SF_SMALL).collect()}
    assert set(full) == set(flat) and len(full) == 5
    for q_id, r in full.items():
        f = flat[q_id]
        assert (r["k"], r["n_hits"], r["recall"]) == (f["k"], f["n_hits"], f["recall"])
        assert r["scan_ppm"] == 1_000_000


def test_ivf_pq_draft_oracle_parity(spark):
    """Registration gate: the draft DuckDB twin is bit-exact at sf0.01."""
    from hadoop_distexec_spark.operators.llmops import (
        IVF_PQ_RECALL_ORACLE,
        ivf_pq_recall,
    )
    from tests.oracle_util import run_pair

    n = run_pair(
        spark, "ivf_pq_recall", ivf_pq_recall, IVF_PQ_RECALL_ORACLE, SF_ORACLE
    )
    assert n == 5


# ---------------------------------------------------------------------------
# stream_outer_join_data (library tier, r11 registration candidate)
# ---------------------------------------------------------------------------


def test_stream_outer_join_semantics(spark):
    """The closed prefix must contain BOTH row kinds — matched rows and
    null-padded abandoned clicks (the state-eviction emission the
    operator exists to witness) — and the matched subset must equal the
    registered inner join restricted to the same closed clicks."""
    import pyspark.sql.functions as F

    from hadoop_distexec_spark.streaming.windows import (
        stream_outer_join_data,
        streaming_join,
    )
    from hadoop_distexec_spark.sources.tables import table

    out = stream_outer_join_data(spark, SF_SMALL).persist()
    matched = out.filter(F.col("matched"))
    nulls = out.filter(~F.col("matched"))
    assert matched.count() > 0 and nulls.count() > 0
    # null rows carry nulls in every purchase column
    assert (
        nulls.filter(
            F.col("purchase_id").isNotNull()
            | F.col("purchase_ts_us").isNotNull()
            | F.col("purchase_value").isNotNull()
        ).count()
        == 0
    )
    ev = table(spark, SF_SMALL, "events")
    closed_ids = {r["click_id"] for r in out.select("click_id").distinct().collect()}
    inner = streaming_join(ev, ev).filter(F.col("click_id").isin(closed_ids))
    got_m = {
        (r["click_id"], r["purchase_id"])
        for r in matched.select("click_id", "purchase_id").collect()
    }
    want_m = {
        (r["click_id"], r["purchase_id"])
        for r in inner.select("click_id", "purchase_id").collect()
    }
    assert got_m == want_m
    out.unpersist()


def test_stream_outer_join_draft_oracle_parity(spark):
    """Registration gate: the draft DuckDB twin is bit-exact at sf0.01."""
    from hadoop_distexec_spark.streaming.windows import (
        STREAM_OUTER_JOIN_ORACLE,
        stream_outer_join_data,
    )
    from tests.oracle_util import run_pair

    n = run_pair(
        spark,
        "stream_outer_join",
        stream_outer_join_data,
        STREAM_OUTER_JOIN_ORACLE,
        SF_ORACLE,
    )
    assert n > 0


def test_stream_outer_join_one_sided_empty_closes_nothing(spark, tmp_path):
    """ADVICE r10 #2: with clicks present and ZERO purchases, the purchase
    side's watermark never advances, so nothing closes — harness AND
    oracle must both return the empty set. DuckDB's LEAST ignores NULLs
    (LEAST(NULL, x) = x), so the pre-fix oracle computed a watermark from
    the click side alone and emitted null-padded abandoned rows the
    streaming runtime would never flush; the NULL-strict CASE pins the
    agreement on this reachable degenerate input."""
    import os

    import duckdb

    from hadoop_distexec_spark.streaming.windows import (
        STREAM_OUTER_JOIN_ORACLE,
        stream_outer_join_data,
    )

    one_sided = str(tmp_path / "clicks_only")
    os.makedirs(one_sided, exist_ok=True)
    con = duckdb.connect()
    # COPY keeps the driver fixture's physical parquet types (timestamps
    # stay micros), so the streaming file source reads it unchanged
    n_clicks = con.execute(
        f"""COPY (SELECT * FROM read_parquet('{SF_ORACLE}/events.parquet')
                  WHERE event_type = 'click')
            TO '{one_sided}/events.parquet' (FORMAT PARQUET)"""
    ).fetchone()[0]
    con.close()
    assert n_clicks > 0

    got = stream_outer_join_data(spark, one_sided)
    assert got.count() == 0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{one_sided}/events.parquet')"
    )
    assert len(con.execute(STREAM_OUTER_JOIN_ORACLE).fetchdf()) == 0
    con.close()


# ---------------------------------------------------------------------------
# connected_components_jump (pointer jumping for chain-shaped capped graphs)
# ---------------------------------------------------------------------------


def test_cc_jump_equals_plain_cc(spark):
    """Same output contract as connected_components on the capped edge
    graph and on a seeded random graph: (doc_id, min reachable id)."""
    import random

    import pyspark.sql.functions as F

    from hadoop_distexec_spark.operators.llmops import embed_edges_capped
    from hadoop_distexec_spark.operators.pipeline import (
        connected_components,
        connected_components_jump,
    )
    from hadoop_distexec_spark.sources.tables import table

    nodes = table(spark, SF_SMALL, "embeddings").select(
        F.col("vec_id").alias("doc_id")
    )
    edges = embed_edges_capped(spark, SF_SMALL).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    plain = {(r["doc_id"], r["component"]) for r in connected_components(nodes, edges).collect()}
    jump = {(r["doc_id"], r["component"]) for r in connected_components_jump(nodes, edges).collect()}
    assert plain == jump and plain

    rng = random.Random(7)
    pairs = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    pairs = [(a, b) for a, b in pairs if a != b]
    e2 = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    n2 = spark.range(200).select(F.col("id").alias("doc_id"))
    plain2 = {(r["doc_id"], r["component"]) for r in connected_components(n2, e2).collect()}
    jump2 = {(r["doc_id"], r["component"]) for r in connected_components_jump(n2, e2).collect()}
    assert plain2 == jump2


def test_cc_jump_handles_long_chains_plain_cannot(spark):
    """The claim the capped tier's switch rests on: a 300-node path has
    diameter 299; plain min-label propagation needs one round per hop and
    must RAISE at max_iter=14, while pointer jumping converges inside the
    same budget (measured 27->18 rounds on the sf0.1 capped graph; the
    gap grows with diameter — at a 100 TB cell the plain loop simply
    never finishes)."""
    import pyspark.sql.functions as F
    import pytest

    from hadoop_distexec_spark.operators.pipeline import (
        connected_components,
        connected_components_jump,
    )

    nodes = spark.range(300).select(F.col("id").alias("doc_id"))
    edges = spark.range(299).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    labels = connected_components_jump(nodes, edges, max_iter=14).collect()
    assert {r["component"] for r in labels} == {0}
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, edges, max_iter=14)


def test_cc_jump_empty_edges_all_singletons(spark):
    """Zero edges is a VALID degenerate input (a corpus with no near-dup
    pairs): every node must come back as its own singleton component
    instead of exhausting max_iter — F.sum observed over an empty frame
    yields NULL, and the pre-fix `changed == 0` never fired (ADVICE r10
    #1). Must match plain connected_components on the same input."""
    import pyspark.sql.functions as F

    from hadoop_distexec_spark.operators.pipeline import (
        connected_components,
        connected_components_jump,
    )

    nodes = spark.range(7).select(F.col("id").alias("doc_id"))
    edges = spark.createDataFrame([], "doc_a long, doc_b long")
    jump = {(r["doc_id"], r["component"]) for r in connected_components_jump(nodes, edges).collect()}
    plain = {(r["doc_id"], r["component"]) for r in connected_components(nodes, edges).collect()}
    assert jump == plain == {(i, i) for i in range(7)}


def test_cc_jump_converges_at_100tb_diameter(spark):
    """VERDICT r10 next-round #3: the default convergence budget must
    cover the operator's own 100 TB design point. A path graph of 10⁴
    nodes has diameter ≈ 10⁴ — the same order as a 100 TB IVF cell
    (m ≈ 5·10⁵ members at cap 16 ⇒ diameter ≈ 3·10⁴) — and the measured
    law rounds ≈ 3.6·log2(d) predicts ~48 rounds, just under the OLD
    default of 50 on this graph and straight past it at the real cell
    size. The new default (256) must converge with room to spare."""
    import pyspark.sql.functions as F

    from hadoop_distexec_spark.operators.pipeline import connected_components_jump

    n = 10_000
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    edges = spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    labels = connected_components_jump(nodes, edges).collect()
    assert len(labels) == n
    assert {r["component"] for r in labels} == {0}


# ---------------------------------------------------------------------------
# line_dedup (library tier, r11 registration candidate)
# ---------------------------------------------------------------------------


def _brute_line_dedup(sf_dir: str):
    import collections
    import hashlib  # noqa: F401

    import duckdb as dk

    from hadoop_distexec_spark.operators.llmops import (
        LINE_BOILER_DF,
        LINE_WORDS,
    )

    rows = dk.sql(
        f"SELECT doc_id, source, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    lines = []  # (doc_id, source, line)
    for doc_id, source, text in rows:
        t = text.strip().split()
        if not t:
            continue
        for p in range((len(t) + LINE_WORDS - 1) // LINE_WORDS):
            lines.append((doc_id, source, " ".join(t[p * LINE_WORDS : (p + 1) * LINE_WORDS])))
    df = collections.defaultdict(set)
    for doc_id, _, line in lines:
        df[line].add(doc_id)
    boiler = {line for line, docs in df.items() if len(docs) >= LINE_BOILER_DF}
    out = {}
    for doc_id, source, line in lines:
        nd, nl, bi, bc = out.get(source, (set(), 0, 0, 0))
        nd = nd | {doc_id}
        nl += 1
        if line in boiler:
            bi += 1
            bc += len(line)
        out[source] = (nd, nl, bi, bc)
    return {
        src: (len(nd), nl, bi, bc, bi * 1_000_000 // nl)
        for src, (nd, nl, bi, bc) in out.items()
    }


def test_line_dedup_brute_force(spark):
    from hadoop_distexec_spark.operators.llmops import line_dedup

    got = {
        r["source"]: (
            r["n_docs"],
            r["n_lines"],
            r["boiler_instances"],
            r["boiler_chars"],
            r["drop_ppm"],
        )
        for r in line_dedup(spark, SF_SMALL).collect()
    }
    assert got == _brute_line_dedup(SF_SMALL)
    # vacuity guards in both directions: the fixture plants cross-doc
    # boilerplate, and most sources are clean
    assert sum(v[2] for v in got.values()) > 0
    assert any(v[2] == 0 for v in got.values())


def test_line_dedup_draft_oracle_parity(spark):
    """Registration gate: the draft DuckDB twin is bit-exact at sf0.01."""
    from hadoop_distexec_spark.operators.llmops import (
        LINE_DEDUP_ORACLE,
        line_dedup,
    )
    from tests.oracle_util import run_pair

    n = run_pair(spark, "line_dedup", line_dedup, LINE_DEDUP_ORACLE, SF_ORACLE)
    assert n > 0


def test_line_dedup_newline_oracle_embeds_audit_tail():
    """The newline twin must carry the registered oracle's audit tail
    VERBATIM (the _PQ_SHARED_CTES slice idiom) so the two splitter
    variants cannot drift in the df/join-back/rollup semantics."""
    from hadoop_distexec_spark.operators.llmops import (
        _LINE_AUDIT_TAIL,
        LINE_DEDUP_NEWLINE_ORACLE,
        LINE_DEDUP_ORACLE,
    )

    assert _LINE_AUDIT_TAIL in LINE_DEDUP_ORACLE
    assert _LINE_AUDIT_TAIL in LINE_DEDUP_NEWLINE_ORACLE
    for cte in ("ln AS (", "dfreq AS (", "flagged AS ("):
        assert cte in _LINE_AUDIT_TAIL, cte


def _newline_fixture(tmp_path):
    """A newline-bearing corpus with PLANTED boilerplate: the footer line
    appears in 4 docs (>= LINE_BOILER_DF) across both sources, every
    other line is unique. Whitespace is plain spaces so Spark trim /
    DuckDB trim / Python strip agree."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    footer = "subscribe to our newsletter for updates"
    docs = [
        (1, "web", f"alpha beta gamma\n{footer}\n  \nunique one"),
        (2, "web", f"delta epsilon\n {footer} "),
        (3, "web", f"zeta eta theta iota\nunique two\n{footer}"),
        (4, "blog", f"kappa lambda\n{footer}\nunique three"),
        (5, "blog", "mu nu xi omicron\nunique four"),
        (6, "blog", ""),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in docs], pa.int64()),
                "source": pa.array([d[1] for d in docs]),
                "text": pa.array([d[2] for d in docs]),
            }
        ),
        f"{tmp_path}/documents.parquet",
    )
    return str(tmp_path), footer


def test_line_dedup_newline_flags_planted_boilerplate(spark, tmp_path):
    """VERDICT r10 next-round #6 law test: on a corpus with planted
    boilerplate LINES, the newline variant flags exactly them (the
    chunker would never see them — a 12-word chunk spans the newline),
    and the variant is bit-exact against its DuckDB twin."""
    import duckdb

    from hadoop_distexec_spark.operators.llmops import (
        LINE_DEDUP_NEWLINE_ORACLE,
        line_dedup_newline,
    )
    from tests.oracle_util import compare

    sf_dir, footer = _newline_fixture(tmp_path)
    got = {
        r["source"]: (
            r["n_docs"],
            r["n_lines"],
            r["boiler_instances"],
            r["boiler_chars"],
            r["drop_ppm"],
        )
        for r in line_dedup_newline(spark, sf_dir).collect()
    }
    # brute force: lines = split('\n') -> trim -> drop empties; the
    # footer is the only cross-doc line (df=4 >= 3); doc 6 (empty text)
    # contributes nothing
    assert got == {
        "web": (3, 8, 3, 3 * len(footer), 3 * 1_000_000 // 8),
        "blog": (2, 5, 1, len(footer), 1 * 1_000_000 // 5),
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    odf = con.execute(LINE_DEDUP_NEWLINE_ORACLE).fetchdf()
    con.close()
    compare(
        line_dedup_newline(spark, sf_dir).toPandas(), odf, "line_dedup_newline"
    )


def test_line_dedup_chunker_stays_green_on_newline_corpus(spark, tmp_path):
    """The other half of the VERDICT #6 law: the registered CHUNKER
    variant, run over the same newline-bearing blob, keeps matching its
    own oracle (newlines are just token whitespace to it) — so a real
    corpus reaching the registered id degrades predictably instead of
    diverging from the witness contract."""
    import duckdb

    from hadoop_distexec_spark.operators.llmops import (
        LINE_DEDUP_ORACLE,
        line_dedup,
    )
    from tests.oracle_util import compare

    sf_dir, _ = _newline_fixture(tmp_path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    odf = con.execute(LINE_DEDUP_ORACLE).fetchdf()
    con.close()
    compare(line_dedup(spark, sf_dir).toPandas(), odf, "line_dedup_chunker")
