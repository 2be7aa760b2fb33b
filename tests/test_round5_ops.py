"""Semantic invariants for the round-5 operators (auto-parity vs DuckDB is
covered by test_oracle_parity; these pin the semantics the oracle can't
see — brute-force recomputation, metric consistency, plan shape)."""

import pytest
from pyspark.sql import functions as F

from hadoop_distexec_spark import registry
from hadoop_distexec_spark.operators import llmops
from hadoop_distexec_spark.sources.tables import table
from tests.conftest import SF_SMALL, SF_ORACLE

SPECS = registry.specs()


def _run(spark, qid, sf=SF_SMALL):
    return SPECS[qid].fn(spark, sf)


def _plan(spark, qid, sf=SF_ORACLE):
    return _run(spark, qid, sf)._jdf.queryExecution().executedPlan().toString()


# --- q_quantile_bins -------------------------------------------------------


def test_quantile_bins_partition_each_group(spark):
    """Per group: bin counts must sum to the group's row count, bins are
    0..3, boundaries non-decreasing, and the approx tier in-tolerance."""
    li = table(spark, SF_SMALL, "lineitem")
    sizes = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rows = _run(spark, "q_quantile_bins").collect()
    per_group: dict = {}
    for r in rows:
        assert 0 <= r["bin"] <= 3
        assert r["bounds_ok"] is True
        lo, hi = r["lo"], r["hi"]
        if lo is not None and hi is not None:
            assert lo <= hi
        per_group[r["l_returnflag"]] = per_group.get(r["l_returnflag"], 0) + r["n_rows"]
    assert per_group == sizes


def test_quantile_bins_are_equi_depth(spark):
    """With continuous doubles (no mass ties), every bin holds n/4 ± the
    interpolation slack of 1 — the property that makes the boundaries a
    valid range-partitioning."""
    rows = _run(spark, "q_quantile_bins").collect()
    by_g: dict = {}
    for r in rows:
        by_g.setdefault(r["l_returnflag"], []).append(r["n_rows"])
    for g, counts in by_g.items():
        n = sum(counts)
        for c in counts:
            assert abs(c - n / 4) <= 1.5, f"{g}: bin sizes {counts}"


# --- q_dedup_prefix --------------------------------------------------------


def test_dedup_prefix_matches_brute_force(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in table(spark, SF_SMALL, "documents").select("doc_id", "text").collect()
    }
    K, CAP = llmops.PREFIX_BLOCK, llmops.PREFIX_MAX_DF
    keyed = {d: t for d, t in docs.items() if len(t) >= K}
    from collections import Counter

    df = Counter(t[:K] for t in keyed.values())
    keyed = {d: t for d, t in keyed.items() if df[t[:K]] <= CAP}
    expect = set()
    for a, ta in keyed.items():
        for b, tb in keyed.items():
            if (len(ta) < len(tb) and tb.startswith(ta)) or (ta == tb and a < b):
                expect.add((a, b))
    got = {(r["doc_a"], r["doc_b"]) for r in _run(spark, "q_dedup_prefix").collect()}
    assert got == expect
    assert got, "fixture has no prefix pairs — the test is vacuous"


def test_dedup_prefix_plan_is_hash_join(spark):
    plan = _plan(spark, "q_dedup_prefix")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_quantile_bins_plan_broadcasts_boundaries(spark):
    """The bin-count pass must join the 3-row boundary table by broadcast
    (never shuffle the scan for it) and contain no nested loop."""
    plan = _plan(spark, "q_quantile_bins")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


# --- q_dedup_recall_eval ---------------------------------------------------


def test_dedup_recall_metrics_consistent(spark):
    r = _run(spark, "q_dedup_recall_eval").collect()[0]
    assert r["n_hits"] <= r["n_truth"]
    assert r["n_hits"] <= r["n_verified_sampled"]
    assert r["n_verified_sampled"] <= r["n_verified"] <= r["n_candidates"]
    assert r["n_truth"] > 0, "fixture has no sampled truth pairs — vacuous"
    assert r["recall"] == r["n_hits"] / r["n_truth"]
    assert r["prec"] == r["n_hits"] / r["n_verified_sampled"]
    assert 0.0 <= r["recall"] <= 1.0 and 0.0 <= r["prec"] <= 1.0


def test_dedup_recall_hits_are_sampled_truth_cap(spark):
    """Every hit is a sampled-truth pair found by the verified arm, so
    hits can never exceed the verified pairs restricted to the sample —
    the estimator compares like with like (sampled vs sampled)."""
    r = _run(spark, "q_dedup_recall_eval").collect()[0]
    assert r["n_hits"] <= min(r["n_truth"], r["n_verified_sampled"])


def test_dedup_recall_verified_equals_minhash_output(spark):
    """The harness's verified arm must be exactly q_dedup_minhash —
    measuring a different pipeline than the one shipped would be lying."""
    r = _run(spark, "q_dedup_recall_eval").collect()[0]
    assert r["n_verified"] == _run(spark, "q_dedup_minhash").count()


# --- q_bpe_apply -----------------------------------------------------------


def test_bpe_apply_matches_reference(spark):
    """Driver-side greedy reference: learn the merge table over the same
    corpus, apply it, compare per-document word/symbol/token counts."""
    rows = table(spark, SF_SMALL, "documents").select("doc_id", "text").collect()
    per_doc = {r["doc_id"]: [list(w) for w in r["text"].split(" ") if w] for r in rows}

    def count_pairs(docs):
        c: dict = {}
        for ws in docs.values():
            for syms in ws:
                for i in range(len(syms) - 1):
                    k = (syms[i], syms[i + 1])
                    c[k] = c.get(k, 0) + 1
        return c

    def apply_merge(syms, a, b, m):
        out: list = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = m
            else:
                out.append(s)
        return out

    for _ in range(llmops.BPE_ROUNDS):
        counts = count_pairs(per_doc)
        if not counts:
            break
        (a, b), _n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        per_doc = {
            d: [apply_merge(w, a, b, a + b) for w in ws] for d, ws in per_doc.items()
        }

    got = {r["doc_id"]: r for r in _run(spark, "q_bpe_apply").collect()}
    for d, ws in per_doc.items():
        if not ws:
            assert d not in got
            continue
        r = got[d]
        assert r["n_words"] == len(ws)
        assert r["n_tokens"] == sum(len(w) for w in ws)
        assert r["n_syms"] >= r["n_tokens"]
    assert set(got) == {d for d, ws in per_doc.items() if ws}


def test_bpe_apply_conserves_characters(spark):
    """Merges change token boundaries, never characters: per doc, the sum
    of token lengths must equal the pre-merge symbol count."""
    out = _run(spark, "q_bpe_apply")
    docs = table(spark, SF_SMALL, "documents").select(
        "doc_id",
        F.length(F.regexp_replace("text", " ", "")).alias("n_chars"),
    )
    j = out.join(docs, "doc_id").where(F.col("n_syms") != F.col("n_chars"))
    assert j.count() == 0


# --- round-6 prep APIs (registered r06) --------------------------------------


def test_uniform_sample_k_is_deterministic_uniform_prefix(spark):
    from hadoop_distexec_spark.operators.llmops import uniform_sample_k

    docs = table(spark, SF_SMALL, "documents").select("doc_id", "source")
    a = {r["doc_id"] for r in uniform_sample_k(docs, 50, "doc_id").collect()}
    b = {r["doc_id"] for r in uniform_sample_k(docs, 50, "doc_id").collect()}
    assert a == b and len(a) == 50
    # k-monotone: the 50-sample is a prefix of the 80-sample (same order)
    c = {r["doc_id"] for r in uniform_sample_k(docs, 80, "doc_id").collect()}
    assert a <= c
    # salt changes the sample
    d = {r["doc_id"] for r in uniform_sample_k(docs, 50, "doc_id", salt="v2").collect()}
    assert a != d
    # plan: partial top-k, no global sort
    plan = (
        uniform_sample_k(docs, 50, "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_embed_norm_stats_matches_python(spark):
    import math

    from hadoop_distexec_spark.operators.llmops import embed_norm_stats

    rows = table(spark, SF_SMALL, "embeddings").select("label", "embedding").collect()
    by_label: dict = {}
    for r in rows:
        n2 = sum(round(float(x) * float(x), 10) for x in r["embedding"])
        by_label.setdefault(r["label"], []).append(n2)
    got = {r["label"]: r for r in embed_norm_stats(spark, SF_SMALL).collect()}
    assert set(got) == set(by_label)
    for lab, norms in by_label.items():
        g = got[lab]
        assert g["n_vecs"] == len(norms)
        assert math.isclose(g["mean_norm2"], sum(norms) / len(norms), rel_tol=1e-9)
        assert math.isclose(g["min_norm2"], min(norms), rel_tol=1e-9)
        assert math.isclose(g["max_norm2"], max(norms), rel_tol=1e-9)
        assert g["n_zero"] == sum(1 for n in norms if n == 0)


def test_r06_prep_draft_oracles_parity(spark):
    """The draft DuckDB twins for the r06-prep APIs must already match
    the functions bit-for-bit at sf0.01 — registration becomes a
    two-line diff with zero correctness risk."""
    from hadoop_distexec_spark.operators.llmops import (
        EMBED_NORM_STATS_ORACLE,
        UNIFORM_SAMPLE_K_ORACLE,
        embed_norm_stats,
        uniform_sample_k,
    )
    from tests.oracle_util import compare, duckdb_conn

    con = duckdb_conn(SF_ORACLE)
    docs = table(spark, SF_ORACLE, "documents").select("doc_id", "source")
    sdf = uniform_sample_k(docs, 100, "doc_id").toPandas()
    odf = con.execute(UNIFORM_SAMPLE_K_ORACLE.format(k=100)).fetchdf()
    compare(sdf, odf, "uniform_sample_k")

    sdf = embed_norm_stats(spark, SF_ORACLE).toPandas()
    odf = con.execute(EMBED_NORM_STATS_ORACLE).fetchdf()
    con.close()
    compare(sdf, odf, "embed_norm_stats")


def test_r06_prep_heavy_hitters_and_skew_draft_parity(spark):
    from hadoop_distexec_spark.operators.llmops import (
        KEY_SKEW_PROFILE_ORACLE,
        SOURCE_TOP_TOKENS_ORACLE,
        key_skew_profile,
        source_top_tokens,
    )
    from tests.oracle_util import compare, duckdb_conn

    con = duckdb_conn(SF_ORACLE)
    compare(
        source_top_tokens(spark, SF_ORACLE).toPandas(),
        con.execute(SOURCE_TOP_TOKENS_ORACLE).fetchdf(),
        "source_top_tokens",
    )
    compare(
        key_skew_profile(spark, SF_ORACLE).toPandas(),
        con.execute(KEY_SKEW_PROFILE_ORACLE).fetchdf(),
        "key_skew_profile",
    )
    con.close()


def test_key_skew_profile_python_recompute(spark):
    from collections import Counter

    from hadoop_distexec_spark.operators.llmops import key_skew_profile

    keys = [r["l_suppkey"] for r in table(spark, SF_SMALL, "lineitem").select("l_suppkey").collect()]
    c = Counter(keys)
    rows = key_skew_profile(spark, SF_SMALL).collect()
    assert len(rows) == min(10, len(c))
    expect_top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[: len(rows)]
    assert [(r["key"], r["cnt"]) for r in rows] == expect_top
    for r in rows:
        assert r["n_rows"] == len(keys) and r["n_keys"] == len(c)
        assert abs(r["skew_factor"] - r["cnt"] / (len(keys) / len(c))) < 1e-9
