"""Round-trip tests for the multi-format IO layer (sources/formats.py):
every supported format must reproduce the source table bit-for-bit,
including NULL-vs-empty-string, embedded delimiters, and timestamps."""

import pytest
from pyspark.sql import functions as F

from hadoop_distexec_spark.sources.formats import read_table_fmt, write_table
from hadoop_distexec_spark.sources.tables import table
from tests.conftest import SF_SMALL


def _sorted_rows(df):
    cols = sorted(df.columns)
    return [tuple(str(v) for v in r) for r in df.select(*cols).orderBy(*cols).collect()]


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_roundtrip_orders(spark, tmp_path, fmt):
    src = table(spark, SF_SMALL, "orders")
    path = str(tmp_path / f"orders_{fmt}")
    write_table(src, path, fmt)
    back = read_table_fmt(spark, path, fmt, schema=src.schema)
    assert back.schema == src.schema
    assert _sorted_rows(back) == _sorted_rows(src)


@pytest.mark.parametrize("fmt", ["csv", "json"])
def test_roundtrip_tricky_strings(spark, tmp_path, fmt):
    src = spark.createDataFrame(
        [
            (1, 'comma, "quoted", done'),
            (2, "line\nbreak"),
            (3, None),
            (4, ""),
            (5, "\\N literal backslash-N"),
        ],
        "id int, s string",
    )
    path = str(tmp_path / f"tricky_{fmt}")
    write_table(src, path, fmt)
    back = read_table_fmt(spark, path, fmt, schema=src.schema)
    got = {r["id"]: r["s"] for r in back.collect()}
    want = {r["id"]: r["s"] for r in src.collect()}
    assert got == want


def test_csv_rejects_nested(spark, tmp_path):
    src = table(spark, SF_SMALL, "embeddings")  # has array<float>
    with pytest.raises(ValueError, match="nested"):
        write_table(src, str(tmp_path / "x"), "csv")


def test_csv_requires_schema(spark, tmp_path):
    src = table(spark, SF_SMALL, "nation")
    path = str(tmp_path / "n_csv")
    write_table(src, path, "csv")
    with pytest.raises(ValueError, match="schema"):
        read_table_fmt(spark, path, "csv")


def test_events_timestamp_roundtrip_json(spark, tmp_path):
    src = table(spark, SF_SMALL, "events").select("event_id", "ts")
    path = str(tmp_path / "events_json")
    write_table(src, path, "json")
    back = read_table_fmt(spark, path, "json", schema=src.schema)
    j = src.alias("a").join(back.alias("b"), "event_id")
    assert j.filter(F.col("a.ts") != F.col("b.ts")).count() == 0
    assert back.count() == src.count()


def test_orc_roundtrips_nested(spark, tmp_path):
    """orc (like parquet, unlike csv) must carry the array<float>
    embedding column losslessly."""
    src = table(spark, SF_SMALL, "embeddings")
    path = str(tmp_path / "emb_orc")
    write_table(src, path, "orc")
    back = read_table_fmt(spark, path, "orc")
    assert back.schema == src.schema
    assert _sorted_rows(back) == _sorted_rows(src)
