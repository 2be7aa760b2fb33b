"""Multi-format table IO: parquet / orc / csv / json round-trip with
schema preservation.

The reference's only "format" is opaque byte streams through a subprocess
(ExecFilesMapper.java:114-123); an analytics engine needs typed columnar
ingest and export. These helpers pin the semantics that make text formats
round-trip losslessly:

- explicit schema on read (never inferSchema in production paths: a schema
  inference pass is a full extra scan at 100 TB and can mis-type columns
  on skewed samples);
- timestamps serialized as ISO-8601 with microsecond precision in UTC;
- csv quoting/escaping set so embedded delimiters/newlines survive.

Scale: files split by task on write, so a 100 TB export parallelizes on
read file-by-file. json stays line-splittable WITHIN a file too; csv reads
use multiLine=true (required to round-trip quoted embedded newlines),
which makes each csv FILE single-split — acceptable because the writer
emits one file per task. For newline-heavy text at scale prefer
json/parquet. Known csv limitation: a string equal to the null sentinel
"\\N" itself cannot be distinguished from NULL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

_CSV_OPTS = {
    "header": "true",
    "quote": '"',
    "escape": '"',
    "timestampFormat": _TS_FMT,
    "nullValue": "\\N",  # distinguish NULL from empty string
}

_JSON_OPTS = {"timestampFormat": _TS_FMT}


def write_table(df: DataFrame, path: str, fmt: str = "parquet", *, mode: str = "overwrite") -> None:
    """Export a DataFrame as parquet/csv/json. csv cannot carry nested or
    array columns — callers must project them out (a ValueError here beats
    a garbled file at read time)."""
    if fmt == "parquet":
        df.write.mode(mode).parquet(path)
    elif fmt == "orc":
        df.write.mode(mode).orc(path)
    elif fmt == "csv":
        bad = [f.name for f in df.schema.fields if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))]
        if bad:
            raise ValueError(f"csv cannot serialize nested columns: {bad}")
        df.write.mode(mode).options(**_CSV_OPTS).csv(path)
    elif fmt == "json":
        df.write.mode(mode).options(**_JSON_OPTS).json(path)
    else:
        raise ValueError(f"unknown format {fmt!r}")


def read_table_fmt(
    spark: SparkSession, path: str, fmt: str = "parquet", *, schema: T.StructType | None = None
) -> DataFrame:
    """Read a table written by write_table. parquet/orc are
    self-describing; csv/json REQUIRE the schema (pass the writer's
    df.schema)."""
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "orc":
        return spark.read.orc(path)
    if schema is None:
        raise ValueError(f"{fmt} read requires an explicit schema")
    if fmt == "csv":
        # multiLine: quoted embedded newlines must not split records
        return spark.read.options(**_CSV_OPTS, multiLine="true").schema(schema).csv(path)
    if fmt == "json":
        return spark.read.options(**_JSON_OPTS).schema(schema).json(path)
    raise ValueError(f"unknown format {fmt!r}")
