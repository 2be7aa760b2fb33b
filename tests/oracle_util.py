"""Local replica of the driver's Spark-vs-DuckDB compare.

Runs a registered query and its oracle SQL at the same scale factor, sorts
columns by name and rows by value, and compares cell-by-cell. Floats must
match to tight tolerance (the design goal is bit-identical; a tiny epsilon
keeps the local gate readable when diagnosing)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from hadoop_distexec_spark.sources.tables import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True, key=lambda s: s.astype(str))
    return df


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, qid: str, rtol: float = 0.0):
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    assert len(a) == len(b), f"{qid}: row count {len(a)} vs oracle {len(b)}"
    assert list(a.columns) == list(b.columns), f"{qid}: columns {list(a.columns)} vs {list(b.columns)}"
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None or (isinstance(x, float) and math.isnan(x)):
                assert y is None or (isinstance(y, float) and math.isnan(y)), f"{qid}.{col}[{i}]: {x!r} vs {y!r}"
            elif isinstance(x, float) and isinstance(y, float):
                assert x == y or math.isclose(x, y, rel_tol=rtol, abs_tol=1e-12), (
                    f"{qid}.{col}[{i}]: {x!r} vs {y!r} (diff {x - y!r})"
                )
            else:
                assert str(x) == str(y), f"{qid}.{col}[{i}]: {x!r} vs {y!r}"


def run_pair(spark, qid: str, fn, oracle: str, sf_dir: str):
    sdf = fn(spark, sf_dir).toPandas()
    con = duckdb_conn(sf_dir)
    odf = con.execute(oracle).fetchdf()
    con.close()
    compare(sdf, odf, qid)
    return len(sdf)
