"""Round-7 invariants for the wave-2 operators (prepped, draft-oracle
parity-tested, then REGISTERED within round 7) — vocabulary coverage
curve, per-source shingle novelty, the top principal component by
unrolled power iteration, padded-packing waste audit, dedup cluster-size
spectrum, and the two streaming DATA-oracle upgrades (stream-stream join
rows, exact-integer stateful totals)."""

import math

import pytest
from pyspark.sql import functions as F

from hadoop_distexec_spark.operators import llmops, pipeline
from hadoop_distexec_spark.sources.tables import table
from tests.conftest import SF_ORACLE, SF_SMALL


def test_r08_prep_draft_oracles_parity(spark):
    """Every r08-prep operator is bit-exact against its draft DuckDB twin
    at sf0.01 BEFORE registration — the same gate the driver will run."""
    from hadoop_distexec_spark.streaming import windows as sw
    from tests.oracle_util import compare, duckdb_conn

    con = duckdb_conn(SF_ORACLE)
    for name, fn, oracle in [
        ("vocab_coverage", llmops.vocab_coverage, llmops.VOCAB_COVERAGE_ORACLE),
        ("ngram_novelty", llmops.ngram_novelty, llmops.NGRAM_NOVELTY_ORACLE),
        ("embed_pca", llmops.embed_pca, llmops.EMBED_PCA_ORACLE),
        ("pack_efficiency", pipeline.pack_efficiency, pipeline.PACK_EFFICIENCY_ORACLE),
        (
            "dedup_cluster_stats",
            pipeline.dedup_cluster_stats,
            pipeline.DEDUP_CLUSTER_STATS_ORACLE,
        ),
        ("stream_join_data", sw.stream_join_data, sw.STREAM_JOIN_DATA_ORACLE),
        (
            "stream_stateful_totals",
            sw.stream_stateful_totals,
            sw.STREAM_STATEFUL_TOTALS_ORACLE,
        ),
    ]:
        compare(fn(spark, SF_ORACLE).toPandas(), con.execute(oracle).fetchdf(), name)


def test_vocab_coverage_monotone(spark):
    """Coverage is monotone in K, bounded by 1, and the largest tier's
    vocab-used never exceeds min(K, total_vocab)."""
    rows = {r["k"]: r for r in llmops.vocab_coverage(spark, SF_ORACLE).collect()}
    ks = sorted(rows)
    assert ks == sorted(llmops.VOCAB_COVERAGE_TIERS)
    prev = 0.0
    for k in ks:
        r = rows[k]
        assert r["n_vocab_used"] <= min(k, r["total_vocab"])
        assert r["covered_occ"] <= r["total_occ"]
        assert prev <= r["coverage"] <= 1.0
        prev = r["coverage"]


def test_ngram_novelty_conservation(spark):
    """Each shingle's first claim lands in exactly one source: the novel
    counts across sources sum to the number of distinct corpus shingles,
    and novelty sits in [0, 1]."""
    df = llmops.ngram_novelty(spark, SF_ORACLE)
    rows = df.collect()
    n_novel_total = sum(r["n_novel"] for r in rows)
    n_distinct = (
        llmops._shingles_df(spark, SF_ORACLE).select("shingle").distinct().count()
    )
    assert n_novel_total == n_distinct
    for r in rows:
        assert 0.0 <= r["novelty"] <= 1.0
        assert r["n_novel"] <= r["n_shingles"]


def test_embed_pca_unit_norm_and_variance_dominance(spark):
    """The returned loading is unit-norm, and projecting onto it captures
    at least as much variance as the best single raw coordinate — the
    minimal 'this is actually a principal direction' sanity check (power
    iteration from e_0 after two rounds should dominate every axis-aligned
    direction on this fixture)."""
    import numpy as np

    rows = llmops.embed_pca(spark, SF_ORACLE).collect()
    v = np.zeros(len(rows))
    for r in rows:
        v[r["dim"]] = r["loading"]
    # 1e-7: the decimal(28,10) per-term quantization leaves ~1e-10 per
    # addend across 64 dims and three sum tiers (measured 4e-9 at sf0.01)
    assert math.isclose(float(np.linalg.norm(v)), 1.0, rel_tol=1e-7)

    emb = (
        table(spark, SF_ORACLE, "embeddings")
        .where(F.col("embedding").isNotNull())
        .select("embedding")
        .toPandas()["embedding"]
    )
    X = np.array([np.asarray(e, dtype=float) for e in emb])
    Xc = X - X.mean(axis=0)
    proj_var = float(((Xc @ v) ** 2).mean())
    axis_var = float((Xc**2).mean(axis=0).max())
    assert proj_var >= axis_var * 0.999


def test_pack_efficiency_closed_form_matches_enumeration(spark):
    """The closed-form pack counts equal an explicit per-bucket
    enumeration in Python (first-fit over equal-size padded slots is
    exactly ceil-division)."""
    docs = table(spark, SF_ORACLE, "documents").select("text").toPandas()["text"]
    cap = pipeline.PACK_TOKENS
    buckets: dict[int, list[int]] = {}
    for text in docs:
        n = len([t for t in text.strip().split() if t])
        if n == 0:
            continue
        p = 1 if n <= 1 else 1 << (n - 1).bit_length()
        buckets.setdefault(p, []).append(n)
    rows = {r["p"]: r for r in pipeline.pack_efficiency(spark, SF_ORACLE).collect()}
    assert set(rows) == set(buckets)
    for p, ns in buckets.items():
        r = rows[p]
        assert r["n_docs"] == len(ns)
        assert r["sum_tokens"] == sum(ns)
        if p <= cap:
            m = cap // p
            assert r["slots_per_pack"] == m
            assert r["n_packs"] == -(-len(ns) // m)
        else:
            assert r["slots_per_pack"] == 0
            assert r["n_packs"] == sum(-(-n // cap) for n in ns)
        assert r["alloc_tokens"] == r["n_packs"] * cap
        assert 0.0 < r["fill_ratio"] <= 1.0


def test_dedup_cluster_stats_consistent_with_groups(spark):
    """The spectrum re-aggregates q_dedup_groups exactly: total docs and
    per-size cluster counts match a Python rollup of the groups frame."""
    import collections

    g = pipeline.q_dedup_groups(spark, SF_ORACLE).collect()
    by_comp = collections.Counter(r["component"] for r in g)
    size_spec = collections.Counter(by_comp.values())
    rows = {r["cluster_size"]: r for r in
            pipeline.dedup_cluster_stats(spark, SF_ORACLE).collect()}
    assert set(rows) == set(size_spec)
    for size, n_clusters in size_spec.items():
        assert rows[size]["n_clusters"] == n_clusters
        assert rows[size]["n_docs"] == n_clusters * size
    assert sum(r["n_docs"] for r in rows.values()) == len(g)


def test_stream_stateful_totals_exact_integers(spark):
    """The stateful op's integer state equals the batch decimal sum user
    by user (both scaled to ten-thousandths), proving the Python
    quantization reproduces the engines' DECIMAL(18,4) cast."""
    from hadoop_distexec_spark.streaming import windows as sw

    got = {r["user_id"]: r for r in
           sw.stream_stateful_totals(spark, SF_ORACLE).collect()}
    batch = (
        table(spark, SF_ORACLE, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)") * 10000)
            .cast("long")
            .alias("e4"),
        )
        .collect()
    )
    assert len(got) == len(batch)
    for r in batch:
        s = got[r["user_id"]]
        assert s["n_events"] == r["n"]
        assert s["total_value_e4"] == r["e4"]


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_r08_prep_plan_shapes(spark):
    """Docstring shape claims, gated on executed plans:
    vocab_coverage's head extraction is TakeOrderedAndProject (never a
    global vocabulary sort); pack_efficiency is join-free; ngram_novelty
    and embed_pca carry no nested-loop join except 1-row scalar
    broadcasts; ngram_novelty's joins are hint-free."""
    p = _plan(llmops.vocab_coverage(spark, SF_SMALL))
    assert "TakeOrderedAndProject" in p, p

    p = _plan(pipeline.pack_efficiency(spark, SF_SMALL))
    assert "Join" not in p, p

    sh = llmops._shingles_df(spark, SF_SMALL)
    nov = llmops._ngram_novelty_frame(spark, SF_SMALL, sh)
    assert "ResolvedHint" not in nov._jdf.queryExecution().analyzed().toString()
    p = _plan(nov)
    assert "BroadcastNestedLoopJoin" not in p, p

    # embed_pca's only nested-loop is the 1-row norm broadcast
    p = _plan(llmops.embed_pca(spark, SF_SMALL))
    assert p.count("BroadcastNestedLoopJoin") <= 1, p


def test_r09_prep_draft_oracles_parity(spark):
    """The round-9 prep wave (measured-quality harnesses) is bit-exact
    against its draft DuckDB twins at sf0.01 before registration."""
    from tests.oracle_util import compare, duckdb_conn

    con = duckdb_conn(SF_ORACLE)
    for name, fn, oracle in [
        ("lang_id_eval", llmops.lang_id_eval, llmops.LANG_ID_EVAL_ORACLE),
        ("join_card_est", llmops.join_card_est, llmops.JOIN_CARD_EST_ORACLE),
        (
            "retrieval_agreement",
            llmops.retrieval_agreement,
            llmops.RETRIEVAL_AGREEMENT_ORACLE,
        ),
        ("embed_whiten", llmops.embed_whiten, llmops.EMBED_WHITEN_ORACLE),
    ]:
        compare(fn(spark, SF_ORACLE).toPandas(), con.execute(oracle).fetchdf(), name)


def test_lang_id_eval_consistent_with_classifier(spark):
    """Confusion cells re-aggregate q_lang_id exactly: cell counts match
    a Python rollup and shares sum to 1 per label."""
    import collections

    rows = llmops.q_lang_id(spark, SF_ORACLE).collect()
    cells = collections.Counter((r["lang"], r["lang_guess"]) for r in rows)
    got = {(r["lang"], r["lang_guess"]): r for r in
           llmops.lang_id_eval(spark, SF_ORACLE).collect()}
    assert set(got) == set(cells)
    for k, n in cells.items():
        assert got[k]["n_docs"] == n
    by_label = collections.defaultdict(float)
    for r in got.values():
        by_label[r["lang"]] += r["share"]
    for lang, tot in by_label.items():
        assert abs(tot - 1.0) < 1e-9, (lang, tot)


def test_join_card_est_formula_matches_materialized_join(spark):
    """The count-product formula equals the materialized join's actual
    cardinality (the audit's 'exact' arm is exact), and the sampled arm
    is consistent with a Python re-derivation of the md5 sample."""
    ev = table(spark, SF_ORACLE, "events").select("user_id", "event_type")
    clicks = ev.where(F.col("event_type") == "click")
    purch = ev.where(F.col("event_type") == "purchase")
    actual = clicks.alias("c").join(
        purch.alias("p"), F.col("c.user_id") == F.col("p.user_id")
    ).count()
    row = llmops.join_card_est(spark, SF_ORACLE).collect()[0]
    assert row["exact_pairs"] == actual
    assert row["n_keys_sampled"] <= row["n_keys_both"]
    assert row["rel_err"] >= 0.0


def test_retrieval_agreement_bounds(spark):
    """Overlap and footrule respect their combinatorial bounds at depth:
    0 <= overlap <= min(n_lex, n_vec); footrule <= n_overlap * (depth-1)."""
    r = llmops.retrieval_agreement(spark, SF_ORACLE).collect()[0]
    assert 0 <= r["n_overlap"] <= min(r["n_lex"], r["n_vec"])
    assert 0.0 <= r["overlap_ratio"] <= 1.0
    assert r["footrule"] <= r["n_overlap"] * (r["depth"] - 1)
    if r["n_overlap"]:
        assert r["mean_rank_gap"] == pytest.approx(
            r["footrule"] / r["n_overlap"]
        )


def test_embed_whiten_removes_component_variance(spark):
    """Removing the top component can only reduce total variance, the
    drop must be strictly positive overall (the fixture cloud is
    anisotropic enough for two power iterations), and per-dim var_after
    stays nonnegative."""
    rows = llmops.embed_whiten(spark, SF_ORACLE).collect()
    tot_b = sum(r["var_before"] for r in rows)
    tot_a = sum(r["var_after"] for r in rows)
    assert tot_a < tot_b
    for r in rows:
        assert r["var_after"] >= 0.0
        assert r["var_before"] >= 0.0


def test_r09_prep_plan_shapes(spark):
    """lang_id_eval stays join-free (per-row classifier + one agg +
    bounded window); join_card_est's only join is the key-count
    equi-join, hint-free; embed_whiten's nested-loop joins are only the
    1-row scalar broadcasts."""
    p = _plan(llmops.lang_id_eval(spark, SF_SMALL))
    assert "Join" not in p, p

    jce = llmops.join_card_est(spark, SF_SMALL)
    assert "ResolvedHint" not in jce._jdf.queryExecution().analyzed().toString()
    p = _plan(jce)
    assert "BroadcastNestedLoopJoin" not in p, p

    p = _plan(llmops.embed_whiten(spark, SF_SMALL))
    assert p.count("BroadcastNestedLoopJoin") <= 1, p
