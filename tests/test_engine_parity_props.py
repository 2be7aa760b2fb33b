"""Cross-engine parity laws for the determinism idioms the operators
lean on (one seeded batch per law, driven through BOTH engines and
compared value-for-value — the micro-scale twin of the oracle gate):

- truncating integer division: Spark ``a div b`` == DuckDB ``a // b``
  for either sign (group_ols' closed form, every ppm share);
- the md5/conv 60-bit bucket: Spark conv(substr(md5(..),1,15),16,10)
  == DuckDB CAST('0x'||substr(md5(..),1,15) AS BIGINT) (minhash bands,
  CMS rows, bloom slices, shard routing);
- round() ties: Spark and DuckDB both round half away from zero for the
  cents/e4 quantizations (drift_tvd, group_ols, pq_recall);
- binary-length log2: Spark length(bin(x)) == DuckDB length(bin(x))
  (token_freq_spectrum buckets, bloom slice sizing).
"""

import random

import duckdb
from pyspark.sql import functions as F


def _duck():
    return duckdb.connect()


def test_trunc_div_parity_both_signs(spark):
    rng = random.Random(0xD1F)
    pairs = [(rng.randint(-10**17, 10**17), rng.choice([-1, 1]) * rng.randint(1, 10**9))
             for _ in range(500)]
    pairs += [(-7, 2), (7, -2), (-7, -2), (0, 5), (10**17, 1), (-(10**17), 3)]
    df = spark.createDataFrame(pairs, "a long, b long").select(
        "a", "b", F.expr("a div b").alias("q")
    )
    got = {(r["a"], r["b"]): r["q"] for r in df.collect()}
    con = _duck()
    for (a, b), q in got.items():
        (dq,) = con.execute(
            "SELECT CAST(? AS BIGINT) // CAST(? AS BIGINT)", [a, b]
        ).fetchone()
        assert q == dq, (a, b, q, dq)
    con.close()


def test_md5_conv_bucket_parity(spark):
    rng = random.Random(0xB33F)
    keys = [str(rng.randint(0, 10**12)) for _ in range(200)]
    keys += ["", "0", "a b", "naïve", "道", "x" * 300]
    df = spark.createDataFrame([(k,) for k in keys], "k string").select(
        "k",
        F.conv(F.substring(F.md5(F.encode("k", "UTF-8")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    got = {r["k"]: r["h"] for r in df.collect()}
    con = _duck()
    for k, h in got.items():
        (dh,) = con.execute(
            "SELECT CAST('0x' || substr(md5(?), 1, 15) AS BIGINT)", [k]
        ).fetchone()
        assert h == dh, (k, h, dh)
    con.close()


def test_round_ties_away_parity(spark):
    # exact-representable halves plus seeded doubles through the cents
    # quantization both engines run
    rng = random.Random(0xCAFE)
    vals = [2.5, -2.5, 3.5, -3.5, 0.5, -0.5, 1234567.5]
    vals += [rng.uniform(-10**6, 10**6) for _ in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "v double").select(
        "v", F.round(F.col("v")).cast("long").alias("r"),
        F.round(F.col("v") * 100).cast("long").alias("rc"),
    )
    got = [(r["v"], r["r"], r["rc"]) for r in df.collect()]
    con = _duck()
    for v, r, rc in got:
        dr, drc = con.execute(
            "SELECT CAST(round(CAST(? AS DOUBLE)) AS BIGINT),"
            " CAST(round(CAST(? AS DOUBLE) * 100) AS BIGINT)", [v, v]
        ).fetchone()
        assert (r, rc) == (dr, drc), (v, r, rc, dr, drc)
    con.close()


def test_binary_length_parity(spark):
    rng = random.Random(0x10C2)
    xs = [1, 2, 3, 4, 7, 8, 1023, 1024, 2**40, 2**62 - 1]
    xs += [rng.randint(1, 2**62) for _ in range(200)]
    df = spark.createDataFrame([(x,) for x in xs], "x long").select(
        "x", F.length(F.bin("x")).alias("n")
    )
    got = {r["x"]: r["n"] for r in df.collect()}
    con = _duck()
    for x, n in got.items():
        (dn,) = con.execute(
            "SELECT length(bin(CAST(? AS BIGINT)))", [x]
        ).fetchone()
        assert n == dn, (x, n, dn)
        assert n == x.bit_length()  # and both equal floor(log2)+1
    con.close()
