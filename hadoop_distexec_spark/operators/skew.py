"""Skew-mitigation utilities: salted joins.

AQE's skew-join handling (enabled in session.py) splits oversized
partitions at runtime; explicit salting is the complementary static tool
when one build-side key is pathologically hot. Salting is
*result-invariant*: the salted query's oracle is the plain join, which is
exactly what q_join_salted checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_distexec_spark.registry import register
from hadoop_distexec_spark.sources.tables import table


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key salt trick: the fact side gets a
    deterministic salt in [0, n_salts) (hash of the whole row's key +
    a per-row component), the dim side is exploded n_salts times, and the
    join runs on (key, salt) — splitting each hot key's rows across
    n_salts reducers instead of one.

    Cost model: dim side inflates x n_salts (fine for dim tables), fact
    side shuffles once either way; the win is that no single reducer owns
    a hot key. Deterministic (pmod of a hash, no rand()) so results are
    reproducible and oracle-checkable.
    """
    salt = F.pmod(F.xxhash64(F.col(fact_key), F.monotonically_increasing_id()), F.lit(n_salts))
    f = fact.withColumn("_salt", salt.cast("int"))
    d = dim.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = f.join(d, (f[fact_key] == d[dim_key]) & (f["_salt"] == d["_salt"]), how)
    return out.drop("_salt")


@register(
    "q_join_salted",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_items,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
             AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lineitem⨝orders join executed through the salt trick; the
    oracle is the PLAIN join — proving salting changes the shuffle
    distribution, never the result."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(li, o, "l_orderkey", "o_orderkey", n_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double").alias("total_price"),
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list,
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase skew-safe aggregation: group by (keys + salt) first so a
    hot key's rows spread over n_salts reducers, then combine the partial
    results in a tiny second aggregate on the true keys. Works for any
    algebraic aggregate expressed as (partial expr, combine expr) pairs in
    ``aggs``: [(partial_col_alias, partial_expr, combine_expr)].

    Spark's hash aggregate is already two-phase (map-side partial), which
    handles most skew; the explicit salt matters when a single key's
    post-combine partial rows still overwhelm one reducer — the classic
    "one key is 30% of the data" shape.
    """
    salt = F.pmod(F.xxhash64(*[F.col(k) for k in keys], F.monotonically_increasing_id()),
                  F.lit(n_salts)).cast("int")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[p.alias(name) for name, p, _ in aggs])
    )
    return partial.groupBy(*keys).agg(*[c(name).alias(name) for name, _, c in aggs])


@register(
    "q_agg_salted",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
             AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lineitem status aggregate executed through the explicit salt:
    partial aggregate on (keys, salt), combine on keys. The oracle is the
    PLAIN group-by — salting redistributes the shuffle, never the result.
    Decimal partial sums stay decimal until the final combine, so the
    two-phase path is bit-identical to the one-phase one."""
    li = table(spark, sf_dir, "lineitem")
    aggs = [
        ("n_items", F.count(F.lit(1)), lambda c: F.sum(c)),
        (
            "sum_qty",
            F.sum(F.col("l_quantity").cast("decimal(18,4)")),
            lambda c: F.sum(c),
        ),
    ]
    out = salted_agg(li, ["l_returnflag", "l_linestatus"], aggs)
    return out.select(
        "l_returnflag",
        "l_linestatus",
        "n_items",
        F.col("sum_qty").cast("double").alias("sum_qty"),
    )
