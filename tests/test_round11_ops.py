"""Round-11 library tiers (r12 registration candidates).

`doc_verbatim_share` closes the dedup family's doc-granular angle: the
other tiers answer pair similarity (q_dedup_ngram), pair run length
(q_substring_runs) and line repetition (q_line_dedup); this one answers
"what fraction of each DOCUMENT is verbatim-reused anywhere" — the
excise-vs-drop decision input, and the oracle-expressible rolling-hash
alternative to corpus-global suffix-array span excision recorded in
SCALE.md's r11 scope note.
"""

from __future__ import annotations

from tests.conftest import SF_ORACLE, SF_SMALL


def _brute_verbatim(sf_dir: str):
    import collections
    import hashlib

    import duckdb as dk

    from hadoop_distexec_spark.operators.llmops import (
        VERBATIM_HI_PPM,
        VERBATIM_K,
        VERBATIM_MIN_DOCS,
    )

    rows = dk.sql(
        f"SELECT doc_id, source, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    wins = []  # (doc_id, source, window-hash)
    for doc_id, source, text in rows:
        t = text.strip().split()
        for p in range(len(t) - VERBATIM_K + 1):
            wh = hashlib.md5(" ".join(t[p : p + VERBATIM_K]).encode()).hexdigest()
            wins.append((doc_id, source, wh))
    docs_per_win = collections.defaultdict(set)
    for doc_id, _, wh in wins:
        docs_per_win[wh].add(doc_id)
    shared = {wh for wh, ds in docs_per_win.items() if len(ds) >= VERBATIM_MIN_DOCS}
    per_doc = collections.defaultdict(lambda: [0, 0])  # (doc,src) -> [n, n_shared]
    for doc_id, source, wh in wins:
        e = per_doc[(doc_id, source)]
        e[0] += 1
        e[1] += wh in shared
    out = {}
    for (_, source), (n, ns) in per_doc.items():
        nd, tw, sw, dws, dmv = out.get(source, (0, 0, 0, 0, 0))
        out[source] = (
            nd + 1,
            tw + n,
            sw + ns,
            dws + (ns > 0),
            dmv + (ns * 1_000_000 // n >= VERBATIM_HI_PPM),
        )
    return {
        src: (nd, tw, sw, sw * 1_000_000 // tw, dws, dmv)
        for src, (nd, tw, sw, dws, dmv) in out.items()
    }


def test_doc_verbatim_share_brute_force(spark):
    from hadoop_distexec_spark.operators.llmops import doc_verbatim_share

    got = {
        r["source"]: (
            r["n_docs"],
            r["total_windows"],
            r["shared_windows"],
            r["verbatim_ppm"],
            r["docs_with_shared"],
            r["docs_mostly_verbatim"],
        )
        for r in doc_verbatim_share(spark, SF_SMALL).collect()
    }
    assert got == _brute_verbatim(SF_SMALL)
    # vacuity guards: the fixture plants verbatim reuse, and clean
    # sources exist
    assert sum(v[2] for v in got.values()) > 0
    assert any(v[2] == 0 for v in got.values())


def test_doc_verbatim_share_draft_oracle_parity(spark):
    """Registration gate: the draft DuckDB twin is bit-exact at sf0.001
    AND sf0.01."""
    from hadoop_distexec_spark.operators.llmops import (
        DOC_VERBATIM_SHARE_ORACLE,
        doc_verbatim_share,
    )
    from tests.oracle_util import run_pair

    for sf in (SF_SMALL, SF_ORACLE):
        n = run_pair(
            spark, "doc_verbatim_share", doc_verbatim_share,
            DOC_VERBATIM_SHARE_ORACLE, sf,
        )
        assert n > 0


def test_doc_verbatim_share_partial_vs_full_copy(spark, tmp_path):
    """The law the metric exists for — and the distinction the natural
    fixture can't show (its planted dups are whole-doc clones, so
    docs_with_shared == docs_mostly_verbatim there): a doc sharing ONE
    window counts in docs_with_shared but not docs_mostly_verbatim; a
    full clone counts in both. Hand-computed audit row over a planted
    fixture, plus oracle agreement on it."""
    import duckdb

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop_distexec_spark.operators.llmops import (
        DOC_VERBATIM_SHARE_ORACLE,
        VERBATIM_K,
        doc_verbatim_share,
    )
    from tests.oracle_util import compare

    assert VERBATIM_K == 8
    quote = "w1 w2 w3 w4 w5 w6 w7 w8"  # exactly one window
    uniq = lambda i, n: " ".join(f"u{i}_{j}" for j in range(n))  # noqa: E731
    clone = "c0 c1 c2 c3 c4 c5 c6 c7 c8 c9"  # 10 tokens -> 3 windows
    docs = [
        # doc 1 quotes the 8-token span inside 24 otherwise-unique tokens:
        # 32 tokens -> 25 windows, 1 shared (40000 ppm < HI)
        (1, "web", f"{uniq(1, 12)} {quote} {uniq(11, 12)}"),
        # doc 2 carries the same quote in a different 20-token context:
        # 28 tokens -> 21 windows, 1 shared
        (2, "web", f"{uniq(2, 10)} {quote} {uniq(22, 10)}"),
        # docs 3/4: exact clones -> all 3 windows shared (1e6 ppm)
        (3, "web", clone),
        (4, "web", clone),
        # doc 5: fully unique, 16 tokens -> 9 windows, 0 shared
        (5, "web", uniq(5, 16)),
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
    rows = doc_verbatim_share(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    total = 25 + 21 + 3 + 3 + 9
    assert r["source"] == "web"
    assert r["n_docs"] == 5
    assert r["total_windows"] == total
    assert r["shared_windows"] == 8
    assert r["verbatim_ppm"] == 8 * 1_000_000 // total
    assert r["docs_with_shared"] == 4  # quoting pair + clone pair
    assert r["docs_mostly_verbatim"] == 2  # only the clones

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    odf = con.execute(DOC_VERBATIM_SHARE_ORACLE).fetchdf()
    con.close()
    compare(
        doc_verbatim_share(spark, str(tmp_path)).toPandas(),
        odf,
        "doc_verbatim_share_planted",
    )


# ---------------------------------------------------------------------------
# gopher_rules (library tier, r12 registration candidate)
# ---------------------------------------------------------------------------


def _brute_gopher(sf_dir: str):
    import duckdb as dk

    from hadoop_distexec_spark.operators.llmops import (
        GOPHER_MAX_MWL,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_MWL,
        GOPHER_MIN_STOPS,
        GOPHER_MIN_WORDS,
        GOPHER_STOPS,
    )

    rows = dk.sql(
        f"SELECT source, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    out = {}
    for source, text in rows:
        t = text.strip().split()
        n = len(t)
        tc = sum(len(x) for x in t)
        n_alpha = sum(any(c.isascii() and c.isalpha() for c in x) for x in t)
        n_sym = sum(x.startswith("#") or "..." in x for x in t)
        n_stop = len({x.lower() for x in t} & set(GOPHER_STOPS))
        r = (
            GOPHER_MIN_WORDS <= n <= GOPHER_MAX_WORDS,
            GOPHER_MIN_MWL * n <= tc <= GOPHER_MAX_MWL * n,
            5 * n_alpha >= 4 * n,
            10 * n_sym <= n,
            n_stop >= GOPHER_MIN_STOPS,
        )
        e = out.setdefault(source, [0, 0, 0, 0, 0, 0, 0])
        e[0] += 1
        for i, ok in enumerate(r):
            e[1 + i] += not ok
        e[6] += all(r)
    return {
        src: tuple(e) + (e[6] * 1_000_000 // e[0],) for src, e in out.items()
    }


def test_gopher_rules_brute_force(spark):
    from hadoop_distexec_spark.operators.llmops import gopher_rules

    got = {
        r["source"]: (
            r["n_docs"], r["fail_words"], r["fail_wordlen"], r["fail_alpha"],
            r["fail_symbol"], r["fail_stops"], r["n_pass"], r["pass_ppm"],
        )
        for r in gopher_rules(spark, SF_SMALL).collect()
    }
    assert got == _brute_gopher(SF_SMALL)
    assert got  # non-vacuous


def test_gopher_rules_draft_oracle_parity(spark):
    """Registration gate: the draft DuckDB twin is bit-exact at sf0.001
    AND sf0.01."""
    from hadoop_distexec_spark.operators.llmops import (
        GOPHER_RULES_ORACLE,
        gopher_rules,
    )
    from tests.oracle_util import run_pair

    for sf in (SF_SMALL, SF_ORACLE):
        n = run_pair(spark, "gopher_rules", gopher_rules, GOPHER_RULES_ORACLE, sf)
        assert n > 0


def test_gopher_rules_each_rule_attributes_its_own_failure(spark, tmp_path):
    """Law test over a planted fixture: six docs, one passing every rule
    and five each violating EXACTLY ONE rule — pins per-rule attribution
    (the natural fixture's synthetic vocabulary fails r_stops everywhere,
    so n_pass is only exercised here), plus oracle agreement."""
    import duckdb

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop_distexec_spark.operators.llmops import (
        GOPHER_RULES_ORACLE,
        gopher_rules,
    )
    from tests.oracle_util import compare

    words = lambda k, n: " ".join(f"{k}word{i:02d}" for i in range(n))  # noqa: E731
    docs = [
        (1, "web", f"the of {words('a', 48)}"),                      # passes all
        (2, "web", f"the of {words('b', 8)}"),                       # only r_words (10 < 50)
        (3, "web", "the of " + " ".join(f"exceedinglylongword{i:02d}" for i in range(48))),  # only r_wordlen
        (4, "web", "the of " + " ".join(48 * ["123456"])),           # only r_alpha
        (5, "web", f"the of {words('e', 42)} " + " ".join(6 * ["#tag"])),  # only r_symbol
        (6, "web", words("f", 50)),                                  # only r_stops
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
    rows = gopher_rules(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (
        r["n_docs"], r["fail_words"], r["fail_wordlen"], r["fail_alpha"],
        r["fail_symbol"], r["fail_stops"], r["n_pass"], r["pass_ppm"],
    ) == ("web", 6, 1, 1, 1, 1, 1, 1, 166_666)[1:]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    odf = con.execute(GOPHER_RULES_ORACLE).fetchdf()
    con.close()
    compare(gopher_rules(spark, str(tmp_path)).toPandas(), odf, "gopher_planted")


# ---------------------------------------------------------------------------
# embed_threshold_curve (library tier, r12 registration candidate)
# ---------------------------------------------------------------------------


def test_embed_threshold_curve_matches_edge_set(spark):
    """Laws: (a) the t=0.20 row IS the capped edge set (the builder
    already thresholds at EMBED_COS_THRESHOLD=0.2 — the dedup_rate_curve
    t=0.1 pin idiom); (b) every row recomputes from a collected copy of
    the registered capped edges (brute force); (c) the curve is
    monotone non-increasing in t."""
    from hadoop_distexec_spark.operators.llmops import (
        EMBED_CURVE_MIN_PCT,
        embed_edges_capped,
        embed_threshold_curve,
    )

    edges = [
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in embed_edges_capped(spark, SF_SMALL).collect()
    ]
    got = {
        r["t_pct"]: (r["n_pairs"], r["n_vecs_covered"], r["vec_share_ppm"])
        for r in embed_threshold_curve(spark, SF_SMALL).collect()
    }
    import duckdb as dk

    n_vecs = dk.sql(
        f"SELECT COUNT(*) FROM '{SF_SMALL}/embeddings.parquet'"
    ).fetchone()[0]
    want = {}
    for t in range(EMBED_CURVE_MIN_PCT, 100, 10):
        hit = [(a, b) for a, b, c in edges if c >= t / 100.0]
        if hit:
            cov = len({v for ab in hit for v in ab})
            want[t] = (len(hit), cov, cov * 1_000_000 // n_vecs)
    assert got == want
    assert got[EMBED_CURVE_MIN_PCT][0] == len(edges)
    ts = sorted(got)
    assert all(got[a][0] >= got[b][0] for a, b in zip(ts, ts[1:]))


def test_embed_threshold_curve_draft_oracle_parity(spark):
    """Registration gate: bit-exact at sf0.001 AND sf0.01, and the
    oracle embeds the REGISTERED q_dedup_embed_capped oracle's CTE chain
    verbatim (containment — the curve cannot drift from the witnessed
    edge builder)."""
    from hadoop_distexec_spark.operators.llmops import (
        _CAPPED_CELLS_LABEL_SQL,
        _capped_window_sql,
        EMBED_THRESHOLD_CURVE_ORACLE,
        embed_threshold_curve,
    )
    from hadoop_distexec_spark.registry import specs
    from tests.oracle_util import run_pair

    assert _CAPPED_CELLS_LABEL_SQL in EMBED_THRESHOLD_CURVE_ORACLE
    assert _capped_window_sql("lcells", "l") in EMBED_THRESHOLD_CURVE_ORACLE
    assert _CAPPED_CELLS_LABEL_SQL in specs()["q_dedup_embed_capped"].oracle
    for sf in (SF_SMALL, SF_ORACLE):
        n = run_pair(
            spark, "embed_threshold_curve", embed_threshold_curve,
            EMBED_THRESHOLD_CURVE_ORACLE, sf,
        )
        assert n > 0


# ---------------------------------------------------------------------------
# kcore_audit (library tier, r12 registration candidate)
# ---------------------------------------------------------------------------


def _brute_kcore(sf_dir: str):
    import collections

    from hadoop_distexec_spark.operators.llmops import KCORE_K

    from hadoop_distexec_spark.session import get_spark
    from hadoop_distexec_spark.operators.llmops import embed_edges_capped

    spark = get_spark("brute-kcore")
    edges = {
        (r["vec_a"], r["vec_b"])
        for r in embed_edges_capped(spark, sf_dir).collect()
    }
    import duckdb as dk

    labels = dict(
        dk.sql(f"SELECT vec_id, label FROM '{sf_dir}/embeddings.parquet'").fetchall()
    )
    # full fixpoint peel (the truncated 8 rounds converge on the fixture,
    # certified by the converged column — so fixpoint == truncation here)
    alive = set(edges)
    while True:
        deg = collections.Counter()
        for a, b in alive:
            deg[a] += 1
            deg[b] += 1
        keep = {v for v, d in deg.items() if d >= KCORE_K}
        nxt = {(a, b) for a, b in alive if a in keep and b in keep}
        if nxt == alive:
            break
        alive = nxt
    per = {}
    n_members = collections.Counter(labels.values())
    core_nodes = {v for ab in alive for v in ab}
    core_per = collections.Counter(labels[v] for v in core_nodes)
    edge_per = collections.Counter(labels[a] for a, b in alive)
    for lab, nm in n_members.items():
        per[lab] = (nm, core_per.get(lab, 0), edge_per.get(lab, 0))
    return per


def test_kcore_audit_brute_force(spark):
    from hadoop_distexec_spark.operators.llmops import kcore_audit

    rows = kcore_audit(spark, SF_SMALL).collect()
    got = {r["label"]: (r["n_members"], r["n_core"], r["n_core_edges"]) for r in rows}
    assert all(r["converged"] for r in rows)  # certificate: truncation == fixpoint
    assert got == _brute_kcore(SF_SMALL)
    # most cells peel to empty at this scale; the positive-core side of
    # the vacuity guard runs at sf0.01 (the sf0.001 clone cluster is
    # below the 3-core size)
    assert any(v[1] == 0 for v in got.values())
    big = {
        r["label"]: (r["n_core"], r["n_core_edges"], r["converged"])
        for r in kcore_audit(spark, SF_ORACLE).collect()
    }
    assert any(n > 0 for n, _, _ in big.values())  # the planted K4 core
    assert all(c for _, _, c in big.values())


def test_kcore_peel_strips_chains_keeps_cliques(spark):
    """The law the tier exists for: connected components would merge a
    chain into one blob; the 3-core peel removes EVERY vertex of a path
    graph but keeps a K4 intact — run directly on a planted symmetric
    edge frame through _kcore_peel."""
    import pyspark.sql.functions as F

    from hadoop_distexec_spark.operators.llmops import _kcore_peel, KCORE_K

    path = [(i, i + 1) for i in range(20)]  # 21-vertex path
    k4 = [(100, 101), (100, 102), (100, 103), (101, 102), (101, 103), (102, 103)]
    e = spark.createDataFrame(path + k4, "a long, b long")
    sym = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    alive, converged = _kcore_peel(sym, KCORE_K, 8)
    assert converged
    core = {(r["u"], r["v"]) for r in alive.collect()}
    assert {v for uv in core for v in uv} == {100, 101, 102, 103}
    assert len(core) == 12  # K4 symmetric


def test_kcore_draft_oracle_parity(spark):
    """Registration gate: bit-exact at sf0.001 AND sf0.01; the oracle
    embeds the REGISTERED capped-edge CTE chain verbatim and unrolls
    exactly KCORE_ROUNDS + 1 materialized peel rounds."""
    from hadoop_distexec_spark.operators.llmops import (
        _CAPPED_CELLS_LABEL_SQL,
        KCORE_AUDIT_ORACLE,
        KCORE_ROUNDS,
        kcore_audit,
    )
    from tests.oracle_util import run_pair

    assert _CAPPED_CELLS_LABEL_SQL in KCORE_AUDIT_ORACLE
    assert f"e{KCORE_ROUNDS + 1} AS MATERIALIZED" in KCORE_AUDIT_ORACLE
    assert f"e{KCORE_ROUNDS + 2}" not in KCORE_AUDIT_ORACLE
    for sf in (SF_SMALL, SF_ORACLE):
        n = run_pair(spark, "kcore_audit", kcore_audit, KCORE_AUDIT_ORACLE, sf)
        assert n > 0


# ---------------------------------------------------------------------------
# stream_full_outer_data (library tier, r12 registration candidate)
# ---------------------------------------------------------------------------


def test_stream_full_outer_draft_oracle_parity(spark):
    """Registration gate: bit-exact at sf0.001 AND sf0.01, and the twin
    reuses the REGISTERED q_stream_outer_join oracle's NULL-strict
    two-sided watermark CTEs verbatim (containment) so the outer-join
    siblings cannot drift on the close bound."""
    from hadoop_distexec_spark.registry import specs
    from hadoop_distexec_spark.streaming.windows import (
        _OUTER_WM_CTES,
        STREAM_FULL_OUTER_ORACLE,
        stream_full_outer_data,
    )
    from tests.oracle_util import run_pair

    assert _OUTER_WM_CTES in STREAM_FULL_OUTER_ORACLE
    assert _OUTER_WM_CTES in specs()["q_stream_outer_join"].oracle
    for sf in (SF_SMALL, SF_ORACLE):
        n = run_pair(
            spark, "stream_full_outer", stream_full_outer_data,
            STREAM_FULL_OUTER_ORACLE, sf,
        )
        assert n > 0


def test_stream_full_outer_exercises_all_three_emissions(spark):
    """The semantics the tier exists for: the closed prefix carries
    MATCHED rows, abandoned clicks (null purchase side — what the
    left-outer id emits) AND orphan purchases (null click side — the
    emission path only a full outer exercises). The matched subset must
    equal the registered inner join restricted to the same closed
    clicks, and every orphan keeps its user_id via the coalesce."""
    import pyspark.sql.functions as F

    from hadoop_distexec_spark.streaming.windows import (
        stream_full_outer_data,
        streaming_join,
    )
    from hadoop_distexec_spark.sources.tables import table

    out = stream_full_outer_data(spark, SF_ORACLE).cache()
    matched = out.filter("matched")
    abandoned = out.filter("click_id IS NOT NULL AND purchase_id IS NULL")
    orphans = out.filter("click_id IS NULL")
    assert matched.count() > 0 and abandoned.count() > 0 and orphans.count() > 0
    assert orphans.filter("user_id IS NULL").count() == 0
    assert orphans.filter("NOT matched").count() == orphans.count()

    ev = table(spark, SF_ORACLE, "events")
    closed_clicks = {r["click_id"] for r in out.filter(
        "click_id IS NOT NULL").select("click_id").distinct().collect()}
    inner = streaming_join(ev, ev).filter(F.col("click_id").isin(closed_clicks))
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


def test_stream_full_outer_one_sided_closes_nothing(spark, tmp_path):
    """One empty side pins the global watermark, so NOTHING closes on
    EITHER side — with purchases only, the orphan rows must NOT flush
    (a matching click could still arrive in an unbounded run); harness
    and NULL-strict oracle agree on the empty set."""
    import os

    import duckdb

    from hadoop_distexec_spark.streaming.windows import (
        STREAM_FULL_OUTER_ORACLE,
        stream_full_outer_data,
    )

    one_sided = str(tmp_path / "purchases_only")
    os.makedirs(one_sided, exist_ok=True)
    con = duckdb.connect()
    n = con.execute(
        f"""COPY (SELECT * FROM read_parquet('{SF_ORACLE}/events.parquet')
                  WHERE event_type = 'purchase')
            TO '{one_sided}/events.parquet' (FORMAT PARQUET)"""
    ).fetchone()[0]
    assert n > 0
    got = stream_full_outer_data(spark, one_sided)
    assert got.count() == 0
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{one_sided}/events.parquet')"
    )
    assert len(con.execute(STREAM_FULL_OUTER_ORACLE).fetchdf()) == 0
    con.close()
