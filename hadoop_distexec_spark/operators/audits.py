"""Round-8 prep wave: sketch-accuracy, drift, privacy, co-occurrence and
windowed-cardinality audits (the hand-off pattern: implemented +
pytest-gated with TESTED draft DuckDB oracle twins now; registration
queued for the round-8 rotation window — the r07 window is fully
allocated at 22 first-witness + 28 stale slots).

Five operators a training-data / analytics pipeline runs continuously:

- ``cms_topk``       — count-min-sketch heavy hitters SHIPPED WITH the
                       harness measuring its overestimate vs exact counts
                       (the repo's standing rule: an estimator ships with
                       its measured error).
- ``drift_tvd``      — train/serve distribution drift between the first
                       and second halves of the event stream: per-bin
                       shares and total-variation distance, all in exact
                       integer parts-per-million.
- ``k_anonymity``    — quasi-identifier group-size spectrum over the
                       customer dimension: how many rows sit in groups
                       smaller than k (re-identification risk) before a
                       dataset ships.
- ``itemset_pairs``  — support-pruned market-basket pair mining over
                       lineitem (parts co-ordered in one order), the
                       classic a-priori first round.
- ``sliding_distinct`` — exact distinct users per 2h/1h sliding window
                       beside an HLL tier whose error is CHECKED in-query
                       (TRUE-flag idiom, cf. q_quantile_bins /
                       q_robust_stats).

Determinism rules follow hadoop_distexec_spark/functions/numeric.py: all
counts and shares are exact bigints (shares in integer ppm via ``div``,
never IEEE division); hashes are the md5/conv 60-bit idiom reproducible
in DuckDB; timestamps export as epoch bigints; every top-k orders by a
unique tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_distexec_spark.sources.tables import table

# ---------------------------------------------------------------------------
# cms_topk — count-min sketch with measured overestimate
# ---------------------------------------------------------------------------

CMS_WIDTH = 1024  # buckets per row; 8 KiB of bigint counters per hash row
CMS_DEPTH = 4  # independent hash rows; min over rows kills most collisions
CMS_TOPK = 20


def _cms_bucket(j: int, key_col: str = "key"):
    """Row-j bucket id: low 60 bits of md5('cm{j}:'||key) mod width — the
    minhash md5/conv idiom (llmops._perm_hash), reproducible in DuckDB as
    CAST('0x'||substr(md5(..),1,15) AS BIGINT) % width."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.encode(
                        F.concat(F.lit(f"cm{j}:"), F.col(key_col).cast("string")),
                        "UTF-8",
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % CMS_WIDTH
    )


def cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters over lineitem part keys, shipped
    with the harness that measures the sketch: the exact top-k parts by
    line count joined against their CMS estimates, reporting each
    overestimate and asserting the one-sided bound (CMS never
    underestimates). The sketch tier of the hot-key audit family next to
    q_key_skew_profile's exact tier — at 100 TB the sketch is what a
    streaming ingest can actually afford to keep per source.

    The sketch is built FROM the exact per-key counts (each key hashes
    to one bucket per row; bucket value = sum of colliding key counts),
    so the estimate equals what a streaming CMS would hold after the
    same rows — without a second pass over raw lines.

    Determinism: exact bigint counts throughout; bucket ids via the md5
    60-bit idiom; top-k ties break on key asc.

    Shape at 100 TB: one key-count aggregate (map-side combined, the
    only full-volume shuffle), a DEPTHxWIDTH-cell sketch aggregate
    (bounded 4096 cells — map-side combinable to almost nothing), a
    TakeOrderedAndProject head for the exact top-k, and a candidates-only
    equi-join of k*depth rows against the bounded sketch (AQE broadcasts
    it at runtime; no static hint needed for a provably tiny side)."""
    li = table(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("key"))
    cnt = li.groupBy("key").agg(F.count(F.lit(1)).alias("cnt"))

    # per-key bucket ids materialized BEFORE the explode (the
    # Generate-amplification rule: never co-locate an expensive expr with
    # the generator that fans its row out)
    hashed = cnt.select(
        "key", "cnt", *[_cms_bucket(j).alias(f"b{j}") for j in range(CMS_DEPTH)]
    )
    jb = hashed.select(
        "key",
        "cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("int").alias("j"), F.col(f"b{j}").alias("b")
                    )
                    for j in range(CMS_DEPTH)
                ]
            )
        ).alias("jb"),
    ).select("key", "cnt", F.col("jb.j").alias("j"), F.col("jb.b").alias("b"))
    sketch = jb.groupBy("j", "b").agg(F.sum("cnt").alias("bucket_cnt"))

    top = cnt.orderBy(F.col("cnt").desc(), "key").limit(CMS_TOPK)
    est = (
        jb.join(top.select("key"), "key")
        .join(sketch, ["j", "b"])
        .groupBy("key", "cnt")
        .agg(F.min("bucket_cnt").alias("cms_est"))
    )
    return est.select(
        "key",
        F.col("cnt").alias("exact_cnt"),
        "cms_est",
        (F.col("cms_est") - F.col("cnt")).alias("overest"),
        (F.col("cms_est") >= F.col("cnt")).alias("bound_ok"),
    )


CMS_TOPK_ORACLE = f"""
    WITH cnt AS (
      SELECT l_partkey AS key, COUNT(*) AS cnt FROM lineitem GROUP BY 1),
    jb AS (
      SELECT key, cnt, j,
             CAST('0x' || substr(md5('cm' || j || ':' || CAST(key AS VARCHAR)),
                                 1, 15)
                  AS BIGINT) % {CMS_WIDTH} AS b
      FROM cnt CROSS JOIN UNNEST([0, 1, 2, 3]) AS t(j)),
    sketch AS (
      SELECT j, b, CAST(SUM(cnt) AS BIGINT) AS bucket_cnt
      FROM jb GROUP BY j, b),
    top AS (SELECT key FROM cnt ORDER BY cnt DESC, key LIMIT {CMS_TOPK}),
    est AS (
      SELECT jb.key, jb.cnt, MIN(s.bucket_cnt) AS cms_est
      FROM jb JOIN top USING (key)
              JOIN sketch s ON s.j = jb.j AND s.b = jb.b
      GROUP BY jb.key, jb.cnt)
    SELECT key, cnt AS exact_cnt, cms_est,
           cms_est - cnt AS overest, cms_est >= cnt AS bound_ok
    FROM est
    """


# ---------------------------------------------------------------------------
# drift_tvd — first-half vs second-half distribution drift, exact ppm
# ---------------------------------------------------------------------------

DRIFT_VALUE_BINS = 8


def drift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between the FIRST and SECOND halves of the
    event stream (split at the exact epoch-micros midpoint): per-feature,
    per-bin event shares before/after and the per-feature total-variation
    distance — the standard train/serve skew check run before a model
    trained on one window scores the next.

    Features: ``event_type`` (categorical, bins = the type domain) and
    ``value_bin`` (8 equal-width bins over the exact integer-cents value
    range). Everything is exact bigint arithmetic: values quantize to
    cents BEFORE binning (integer bin index, no IEEE floor near a
    boundary — the FMA-drift lesson), shares are integer parts-per-million
    via ``div``, and TVD is half the sum of absolute ppm diffs.

    Shape at 100 TB: one 1-row min/max scalar broadcast onto the scan
    (static hint whitelisted: provably 1 row), then ONE conditional
    aggregate over a fixed 2x explode (each event emits its two
    (feature, bucket) rows) — map-side combinable to <=|types|+bins
    cells; the TVD window runs over those bounded cells only. Two scans
    of events total (stats + bins), each pruned to 3 columns."""
    ev = table(spark, sf_dir, "events").select(
        F.unix_micros("ts").alias("tus"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("vcents"),
    )
    stats = ev.agg(
        F.min("tus").alias("lo"),
        F.max("tus").alias("hi"),
        F.min("vcents").alias("vlo"),
        F.max("vcents").alias("vhi"),
    )
    j = ev.crossJoin(F.broadcast(stats))
    # one scan feeds BOTH features: each event explodes to its two
    # (feature, bucket) rows — a fixed 2x fan-out of 3 small columns, vs
    # a union of two branches that would scan events twice and duplicate
    # the stats broadcast
    fb = j.select(
        (F.col("tus") * 2 <= F.col("lo") + F.col("hi")).alias("is_before"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("event_type").alias("feature"),
                    F.col("event_type").alias("bucket"),
                ),
                F.struct(
                    F.lit("value_bin").alias("feature"),
                    F.expr(
                        f"CAST((vcents - vlo) * {DRIFT_VALUE_BINS}"
                        " div (vhi - vlo + 1) AS STRING)"
                    ).alias("bucket"),
                ),
            )
        ).alias("fb"),
    ).select("is_before", F.col("fb.feature").alias("feature"), F.col("fb.bucket").alias("bucket"))
    cells = (
        fb.groupBy("feature", "bucket")
        .agg(
            F.sum(F.when(F.col("is_before"), 1).otherwise(0)).alias("n_before"),
            F.sum(F.when(F.col("is_before"), 0).otherwise(1)).alias("n_after"),
        )
    )
    shares = cells.select(
        "feature",
        "bucket",
        "n_before",
        "n_after",
        F.expr("n_before * 1000000 div sum(n_before) OVER (PARTITION BY feature)")
        .cast("long")
        .alias("share_before_ppm"),
        F.expr("n_after * 1000000 div sum(n_after) OVER (PARTITION BY feature)")
        .cast("long")
        .alias("share_after_ppm"),
    )
    return shares.select(
        "feature",
        "bucket",
        "n_before",
        "n_after",
        "share_before_ppm",
        "share_after_ppm",
        F.abs(F.col("share_before_ppm") - F.col("share_after_ppm")).alias("drift_ppm"),
        F.expr(
            "sum(abs(share_before_ppm - share_after_ppm)) "
            "OVER (PARTITION BY feature) div 2"
        )
        .cast("long")
        .alias("tvd_half_ppm"),
    )


DRIFT_TVD_ORACLE = f"""
    WITH ev AS (
      SELECT epoch_us(ts) AS tus, event_type,
             CAST(round(value * 100) AS BIGINT) AS vcents
      FROM events),
    stats AS (
      SELECT MIN(tus) AS lo, MAX(tus) AS hi,
             MIN(vcents) AS vlo, MAX(vcents) AS vhi
      FROM ev),
    rows_both AS (
      SELECT 'event_type' AS feature, event_type AS bucket,
             tus * 2 <= lo + hi AS is_before
      FROM ev, stats
      UNION ALL
      SELECT 'value_bin' AS feature,
             CAST((vcents - vlo) * {DRIFT_VALUE_BINS} // (vhi - vlo + 1)
                  AS VARCHAR) AS bucket,
             tus * 2 <= lo + hi AS is_before
      FROM ev, stats),
    cells AS (
      SELECT feature, bucket,
             CAST(SUM(CASE WHEN is_before THEN 1 ELSE 0 END) AS BIGINT)
               AS n_before,
             CAST(SUM(CASE WHEN is_before THEN 0 ELSE 1 END) AS BIGINT)
               AS n_after
      FROM rows_both GROUP BY feature, bucket),
    shares AS (
      SELECT feature, bucket, n_before, n_after,
             CAST(n_before * 1000000 //
                  SUM(n_before) OVER (PARTITION BY feature) AS BIGINT)
               AS share_before_ppm,
             CAST(n_after * 1000000 //
                  SUM(n_after) OVER (PARTITION BY feature) AS BIGINT)
               AS share_after_ppm
      FROM cells)
    SELECT feature, bucket, n_before, n_after,
           share_before_ppm, share_after_ppm,
           abs(share_before_ppm - share_after_ppm) AS drift_ppm,
           CAST(SUM(abs(share_before_ppm - share_after_ppm))
                  OVER (PARTITION BY feature) // 2 AS BIGINT) AS tvd_half_ppm
    FROM shares
    """


# ---------------------------------------------------------------------------
# k_anonymity — quasi-identifier group-size spectrum
# ---------------------------------------------------------------------------

K_ANON_THRESHOLD = 5
K_ANON_BAL_BUCKET = 1000.0


def k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the customer dimension under the quasi-
    identifier (nation, market segment, account-balance bucket of
    {K_ANON_BAL_BUCKET:.0f}): the group-size spectrum — for each observed
    group size k, how many QI groups and rows sit at that size, each
    row's share of the table in exact ppm, and whether that size is
    below the k={K_ANON_THRESHOLD} re-identification threshold. The
    release gate a dataset passes before customer-joined exports ship.

    Determinism: the balance bucket is floor of ONE IEEE division (same
    single-op expression both engines); everything else is exact bigint.

    Shape at 100 TB: one hash aggregate on the QI key (map-side
    combined), then a second aggregate on the group SIZE whose domain is
    bounded by the largest QI group — output is a handful of rows; the
    ppm window runs over those bounded rows only. No join, no sort
    beyond the spectrum's own bounded output."""
    c = table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / F.lit(K_ANON_BAL_BUCKET)).cast("long").alias(
            "bal_bucket"
        ),
    )
    groups = c.groupBy("c_nationkey", "c_mktsegment", "bal_bucket").agg(
        F.count(F.lit(1)).alias("k_size")
    )
    spectrum = groups.groupBy("k_size").agg(
        F.count(F.lit(1)).alias("n_groups"),
        (F.count(F.lit(1)) * F.col("k_size")).alias("n_rows"),
    )
    return spectrum.select(
        "k_size",
        "n_groups",
        "n_rows",
        (F.col("k_size") < K_ANON_THRESHOLD).alias("at_risk"),
        F.expr("n_rows * 1000000 div sum(n_rows) OVER ()")
        .cast("long")
        .alias("share_rows_ppm"),
    )


K_ANONYMITY_ORACLE = f"""
    WITH qi AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / {K_ANON_BAL_BUCKET}) AS BIGINT)
               AS bal_bucket
      FROM customer),
    groups AS (
      SELECT c_nationkey, c_mktsegment, bal_bucket, COUNT(*) AS k_size
      FROM qi GROUP BY 1, 2, 3),
    spectrum AS (
      SELECT k_size, COUNT(*) AS n_groups, COUNT(*) * k_size AS n_rows
      FROM groups GROUP BY k_size)
    SELECT CAST(k_size AS BIGINT) AS k_size,
           CAST(n_groups AS BIGINT) AS n_groups,
           CAST(n_rows AS BIGINT) AS n_rows,
           k_size < {K_ANON_THRESHOLD} AS at_risk,
           CAST(n_rows * 1000000 // SUM(n_rows) OVER () AS BIGINT)
             AS share_rows_ppm
    FROM spectrum
    """


# ---------------------------------------------------------------------------
# itemset_pairs — support-pruned market-basket pair mining
# ---------------------------------------------------------------------------

ITEMSET_MIN_SUPPORT = 25  # an item must appear in >= this many orders
ITEMSET_MIN_PAIR = 3  # a pair must co-occur in >= this many orders
ITEMSET_TOPK = 50


def itemset_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-priori round one over lineitem baskets: pairs of parts
    co-ordered in the same order, counted only between FREQUENT items
    (support >= {ITEMSET_MIN_SUPPORT} orders) and kept when the pair
    itself co-occurs >= {ITEMSET_MIN_PAIR} times; top
    {ITEMSET_TOPK} pairs by co-count with each side's support and the
    exact-ppm Jaccard of their order sets.

    Determinism: exact bigint counts; pair key ordered part_a < part_b;
    top-k ties break on (part_a, part_b); Jaccard in integer ppm.

    Shape at 100 TB: the a-priori downward-closure prune — per-item
    supports first (one map-side-combined agg), frequent filter, then
    the pair self-join runs only between frequent items (hint-free
    equi-joins; AQE sizes the frequent-item side at runtime). Pair
    fan-out per order is bounded by the order's own basket size (TPC-H
    orders hold <= ~13 distinct parts -> <= 78 pairs), so the join output
    is ~40x the basket count, not quadratic in the catalog. The pair
    aggregate map-side combines; the head is TakeOrderedAndProject."""
    items = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    sup = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("sup"))
    freq = sup.where(F.col("sup") >= ITEMSET_MIN_SUPPORT)
    fitems = items.join(freq, "l_partkey").select("l_orderkey", "l_partkey", "sup")
    a = fitems.select(
        "l_orderkey",
        F.col("l_partkey").alias("part_a"),
        F.col("sup").alias("sup_a"),
    )
    b = fitems.select(
        "l_orderkey",
        F.col("l_partkey").alias("part_b"),
        F.col("sup").alias("sup_b"),
    )
    pairs = a.join(b, "l_orderkey").where(F.col("part_a") < F.col("part_b"))
    pc = (
        pairs.groupBy("part_a", "part_b", "sup_a", "sup_b")
        .agg(F.count(F.lit(1)).alias("n_co"))
        .where(F.col("n_co") >= ITEMSET_MIN_PAIR)
    )
    return (
        pc.select(
            "part_a",
            "part_b",
            "n_co",
            "sup_a",
            "sup_b",
            F.expr("n_co * 1000000 div (sup_a + sup_b - n_co)")
            .cast("long")
            .alias("jaccard_ppm"),
        )
        .orderBy(F.col("n_co").desc(), "part_a", "part_b")
        .limit(ITEMSET_TOPK)
    )


ITEMSET_PAIRS_ORACLE = f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    sup AS (
      SELECT l_partkey, COUNT(*) AS sup FROM items GROUP BY 1),
    fitems AS (
      SELECT i.l_orderkey, i.l_partkey, s.sup
      FROM items i JOIN sup s USING (l_partkey)
      WHERE s.sup >= {ITEMSET_MIN_SUPPORT}),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             a.sup AS sup_a, b.sup AS sup_b
      FROM fitems a JOIN fitems b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey < b.l_partkey),
    pc AS (
      SELECT part_a, part_b, sup_a, sup_b, COUNT(*) AS n_co
      FROM pairs GROUP BY 1, 2, 3, 4
      HAVING COUNT(*) >= {ITEMSET_MIN_PAIR})
    SELECT part_a, part_b, CAST(n_co AS BIGINT) AS n_co,
           CAST(sup_a AS BIGINT) AS sup_a, CAST(sup_b AS BIGINT) AS sup_b,
           CAST(n_co * 1000000 // (sup_a + sup_b - n_co) AS BIGINT)
             AS jaccard_ppm
    FROM pc
    ORDER BY n_co DESC, part_a, part_b LIMIT {ITEMSET_TOPK}
    """


# ---------------------------------------------------------------------------
# sliding_distinct — exact sliding-window cardinality + checked HLL tier
# ---------------------------------------------------------------------------

SLIDE_WINDOW_S = 7200  # 2h windows
SLIDE_STEP_S = 3600  # sliding every 1h
SLIDE_HLL_RSD = 0.005  # ~64 KiB of registers per window partial; measured
# max rel-err 0% (sf0.01) / 1.2% (sf0.1) -> the 10% flag holds with 8x
# margin, and at 100 TB cardinalities the HLL variance only shrinks
# relative to the bound (rsd 0.5% -> 10% = 20 sigma)
SLIDE_HLL_BOUND_PCT = 10  # |hll - exact| * 100 <= BOUND_PCT * exact


def sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per 2-hour window sliding hourly over the event
    stream: each event lands in the two hourly-aligned windows covering
    it (explode to window starts, dedupe per window), counted exactly,
    with an HLL (approx_count_distinct, rsd {SLIDE_HLL_RSD}) tier
    cross-checked IN-QUERY against the exact count — the TRUE-flag
    sketch idiom: the output carries the bound check, the oracle asserts
    it, and a sketch drifting past {SLIDE_HLL_BOUND_PCT}% flips the flag
    and fails the hash compare.

    Determinism: window starts as epoch-seconds bigints (UTC-pinned
    date_trunc both engines); exact distinct count; the flag compares
    integers ({SLIDE_HLL_BOUND_PCT}% as *100/*{SLIDE_HLL_BOUND_PCT}
    integer inequality, no IEEE).

    Shape at 100 TB: the explode is a fixed 2x fan-out (window/step), so
    the shuffled volume is 2x events — the alternative (a range join of
    events against a generated window table) shuffles the same rows AND
    adds the join. One hash aggregate on (window, user) implicitly via
    count-distinct's two-phase plan; partial aggregation runs map-side.
    At 100 TB the deployment keeps ONLY the HLL arm (one pass, mergeable
    sketches, no distinct shuffle); the exact arm is the audit tier this
    harness exists to price — the flag proves the cheap tier honest."""
    ev = table(spark, sf_dir, "events").select(
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("h"),
        "user_id",
    )
    wins = ev.select(
        F.explode(
            F.array(F.col("h"), F.col("h") - F.lit(SLIDE_STEP_S))
        ).alias("win_start_s"),
        "user_id",
    )
    agg = wins.groupBy("win_start_s").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.approx_count_distinct("user_id", SLIDE_HLL_RSD).alias("hll"),
    )
    return agg.select(
        "win_start_s",
        "n_events",
        "n_users",
        (
            F.abs(F.col("hll") - F.col("n_users")) * 100
            <= F.lit(SLIDE_HLL_BOUND_PCT) * F.col("n_users")
        ).alias("hll_within_10pct"),
    )


SLIDING_DISTINCT_ORACLE = f"""
    WITH wins AS (
      SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) + d
               AS win_start_s,
             user_id
      FROM events CROSS JOIN UNNEST([0, -{SLIDE_STEP_S}]) AS t(d))
    SELECT win_start_s, COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           TRUE AS hll_within_10pct
    FROM wins GROUP BY win_start_s
    """
