"""Relational operator surface — the [EXT] queries of SURVEY.md §2.5.

The reference engine has no joins/aggregations/windows (map-only job,
reference DistExec.java:452); this module provides them Spark-first: plain
DataFrame API so Catalyst owns join strategy, pushdown, pruning and codegen.

Every query is registered with a DuckDB oracle twin. Determinism rules (why
every SUM goes through DECIMAL, why timestamps export as epoch bigints, why
windows carry tiebreakers) are documented in
``hadoop_distexec_spark.functions.numeric``.

Scale notes (100 TB):
- lineitem⨝orders is the big-big join: both sides shuffle on the join key;
  AQE handles skew. No driver-side collection anywhere.
- dimension joins (region/nation/part/supplier) are explicitly
  ``F.broadcast`` — at 100 TB those tables are still small.
- top-k uses ``orderBy().limit(k)`` which Spark executes as per-partition
  partial top-k + single-reducer merge (TakeOrderedAndProject), no full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from hadoop_distexec_spark.functions.numeric import DEC, davg, dsum, revenue_expr
from hadoop_distexec_spark.registry import register
from hadoop_distexec_spark.sources.tables import table

# --------------------------------------------------------------------------
# Aggregations
# --------------------------------------------------------------------------


@register(
    "q_agg_groupby",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style multi-aggregate groupBy (hash agg + partial map-side combine)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(revenue_expr()).cast("double").alias("sum_disc_price"),
            davg("l_quantity", "avg_qty"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q_agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """countDistinct — expands to a two-phase distinct aggregate in Catalyst."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "total_price"),
    )


@register(
    "q_agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (grouping-sets expansion in Catalyst)."""
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"), dsum("l_quantity", "sum_qty")
    )


@register(
    "q_agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dimensions."""
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "total_price")
    )


@register(
    "q_agg_approx",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           TRUE AS parts_within_tol,
           TRUE AS orders_within_tol,
           TRUE AS p50_within_tol,
           TRUE AS p95_within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approx distinct + approx quantiles — the 100 TB-scale cardinality
    path, made hash-checkable (VERDICT r02 #5): sketch estimates are
    engine-specific, so the raw estimates can't be oracle'd; instead the
    frame carries (a) exact twin columns the oracle hash-checks directly,
    and (b) within-tolerance booleans comparing Spark's sketch to Spark's
    own exact value, which the oracle asserts as literal TRUE — so a sketch
    drifting out of its error bound flips a hash-checked column.

    Tolerances: HLL rsd=0.02, bound 5% (2.5 sigma); percentile_approx
    accuracy=10000 gives rank error n/10000, bounded by the exact 45th/55th
    (resp. 94th/96th) percentiles — orders of magnitude looser than the
    guarantee at any SF. At 100 TB the exact twins are the expensive path
    (full distinct shuffle) and the sketches are the product; here the twins
    double as the correctness witness.

    Shape: the sketch arm, the exact-distinct arm and the exact-percentile
    arm run as THREE separate aggregations joined on the 3-row group key —
    one combined groupBy plans an Expand for the two countDistincts whose
    tripled rows drag the percentile/HLL buffers through a sort aggregate
    (measured 210s, and one JVM OOM, at the 10x lane vs ~8s decomposed;
    the sliding_distinct lesson on a registered operator).
    """
    li = table(spark, sf_dir, "lineitem")
    sketches = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("_ap"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("_ao"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("_p50"),
        F.percentile_approx("l_extendedprice", 0.95, 10000).alias("_p95"),
    )
    exacts = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )
    pcts = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.45)").alias("_p50_lo"),
        F.expr("percentile(l_extendedprice, 0.55)").alias("_p50_hi"),
        F.expr("percentile(l_extendedprice, 0.94)").alias("_p95_lo"),
        F.expr("percentile(l_extendedprice, 0.96)").alias("_p95_hi"),
    )
    agg = sketches.join(exacts, "l_returnflag").join(pcts, "l_returnflag")
    within = lambda approx, exact: (  # noqa: E731
        F.abs(F.col(approx) - F.col(exact)) <= 0.05 * F.col(exact)
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        "exact_orders",
        within("_ap", "exact_parts").alias("parts_within_tol"),
        within("_ao", "exact_orders").alias("orders_within_tol"),
        F.col("_p50").between(F.col("_p50_lo"), F.col("_p50_hi")).alias("p50_within_tol"),
        F.col("_p95").between(F.col("_p95_lo"), F.col("_p95_hi")).alias("p95_within_tol"),
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------


@register(
    "q_join_inner",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_custkey, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 450000.0
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain equi-join; Catalyst picks broadcast vs sort-merge from stats/AQE."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000.0)
    c = table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "q_join_broadcast",
    oracle="""
    SELECT p_brand,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⨝dim with an explicit broadcast hint — no shuffle of lineitem."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum(revenue_expr()).cast("double").alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


@register(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join ≡ EXISTS — customers with at least one big order."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join ≡ NOT EXISTS — same semantics as DistCp's
    delete-nonexisting sorted-merge scan (reference src/reference/DistCp.java:1278-1322),
    expressed relationally."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "q_join_multi",
    oracle="""
    SELECT r_name, n_name,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def q_join_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way star join: big-big shuffle join (lineitem⨝orders) then
    progressively smaller broadcast dims — the flagship query."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(revenue_expr()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# --------------------------------------------------------------------------
# Windows
# --------------------------------------------------------------------------


@register(
    "q_win_rank",
    oracle="""
    SELECT n_name, s_name, s_acctbal, bal_rank FROM (
      SELECT n_name, s_name, s_acctbal,
             RANK() OVER (PARTITION BY n_nationkey
                          ORDER BY s_acctbal DESC, s_suppkey) AS bal_rank
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
    ) t WHERE bal_rank <= 3
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 suppliers per nation by account balance (rank window)."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    w = W.partitionBy("n_nationkey").orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .withColumn("bal_rank", F.rank().over(w))
        .filter(F.col("bal_rank") <= 3)
        .select("n_name", "s_name", "s_acctbal", "bal_rank")
    )


@register(
    "q_win_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
             AS running_total
    FROM orders
    """,
)
def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer (cumulative frame, unique tiebreaker)."""
    o = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_total"),
    )


@register(
    "q_win_lag",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           LAG(o_totalprice) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS prev_price,
           o_totalprice - LAG(o_totalprice) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS price_delta
    FROM orders
    """,
)
def q_win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG + per-row delta (per-row double subtraction is deterministic)."""
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_totalprice").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        prev.alias("prev_price"),
        (F.col("o_totalprice") - prev).alias("price_delta"),
    )


# --------------------------------------------------------------------------
# Sort / top-k / set ops
# --------------------------------------------------------------------------


@register(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 orders by price — Spark plans TakeOrderedAndProject
    (per-partition partial top-k, no global sort)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "q_set_union",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey FROM orders WHERE o_totalprice > 490000.0
    """,
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select(F.col("c_custkey").alias("custkey"))
    b = o.filter(F.col("o_totalprice") > 490000.0).select(F.col("o_custkey").alias("custkey"))
    return a.unionByName(b).distinct()


@register(
    "q_set_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — customers minus those with finished orders."""
    c = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return c.exceptAll(o.distinct()).distinct()


@register(
    "q_set_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) — customers with both urgent and low orders."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderpriority") == "5-LOW").select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b)


# --------------------------------------------------------------------------
# Scalar functions
# --------------------------------------------------------------------------


@register(
    "q_fn_string",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           SUBSTR(p_name, 1, 5) AS name_prefix,
           LENGTH(p_name) AS name_len,
           REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS vowels_masked,
           SPLIT_PART(p_name, ' ', 2) AS second_word,
           CONCAT(p_brand, ':', p_type) AS brand_type
    FROM part
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery (all JVM-side, codegen'd)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("vowels_masked"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("second_word"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
    )


@register(
    "q_fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS order_year,
           CAST(MONTH(o_orderdate) AS INT) AS order_month,
           CAST(DAY(o_orderdate) AS INT) AS order_day,
           CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT)
             AS days_to_2002,
           CAST(FLOOR(EPOCH(DATE_TRUNC('month', o_orderdate))) AS BIGINT) AS month_start_epoch
    FROM orders
    """,
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function battery; epoch bigints instead of raw timestamps."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("int")
        .alias("days_to_2002"),
        F.unix_timestamp(F.date_trunc("month", F.col("o_orderdate"))).alias("month_start_epoch"),
    )


@register(
    "q_fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           ABS(l_extendedprice - 50000.0) AS abs_dev,
           CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
           SQRT(l_extendedprice) AS price_sqrt,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod
    FROM lineitem
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function battery — per-row IEEE ops only (no cross-row reduction)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.abs(F.col("l_extendedprice") - 50000.0).alias("abs_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@register(
    "q_fn_json",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    """,
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props column."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
    )


@register(
    "q_fn_array",
    oracle="""
    SELECT vec_id, label,
           CAST(LEN(embedding) AS INT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           CAST(CAST(LIST_SUM(LIST_TRANSFORM(embedding,
                x -> CAST(CAST(x AS DOUBLE) AS DECIMAL(12,8))
                     * CAST(CAST(x AS DOUBLE) AS DECIMAL(12,8)))) AS VARCHAR) AS DOUBLE) AS norm_sq
    FROM embeddings
    """,
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function battery over the embedding column; the squared-norm
    reduction goes through exact decimals so it is order-insensitive (see
    functions/numeric.py). Accumulator is DECIMAL(30,16): wide enough to
    stay exact, narrow enough that each addition avoids Spark's
    precision-38 cap (which would silently round scale to 15)."""
    e = table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.aggregate(
            F.transform(
                "embedding",
                lambda c: (
                    c.cast("double").cast("decimal(12,8)")
                    * c.cast("double").cast("decimal(12,8)")
                ),
            ),
            F.lit(0).cast("decimal(30,16)"),
            lambda acc, v: (acc + v).cast("decimal(30,16)"),
        )
        .cast("double")
        .alias("norm_sq"),
    )
