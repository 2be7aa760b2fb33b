"""Write-time layout → scan-time data skipping: the z-order/sort layouts
must actually cluster values so parquet row-group stats prune."""

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from hadoop_distexec_spark.sources.layout import (
    _morton_expr,
    sort_layout,
    zorder_key,
    zorder_layout,
)
from hadoop_distexec_spark.sources.tables import table

SF = "/root/testdata/sf0.01"


def _file_ranges(path, col):
    """Per-file (min, max) of col across the written parquet files."""
    import pathlib

    out = []
    for f in pathlib.Path(path).glob("*.parquet"):
        md = pq.ParquetFile(str(f)).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ci = names[col]
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            mins.append(st.min)
            maxs.append(st.max)
        out.append((min(mins), max(maxs)))
    return out


def test_morton_interleaves_bits(spark):
    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
    z = df.select(_morton_expr(F.col("a"), F.col("b")).alias("z")).collect()[0]["z"]
    # a=101, b=011 -> bits (b2 a2 b1 a1 b0 a0) = 0 1 1 0 1 1 = 0b011011
    assert z == 0b011011


def test_zorder_key_is_deterministic_and_bounded(spark):
    o = table(spark, SF, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    k1 = zorder_key(o, "o_custkey", "o_totalprice").select("o_orderkey", "_zkey")
    k2 = zorder_key(o, "o_custkey", "o_totalprice").select("o_orderkey", "_zkey")
    a = {r["o_orderkey"]: r["_zkey"] for r in k1.collect()}
    b = {r["o_orderkey"]: r["_zkey"] for r in k2.collect()}
    assert a == b
    assert all(0 <= v < (1 << 32) for v in a.values())


def _overlap_score(ranges):
    """Mean pairwise overlap fraction of the per-file value ranges —
    0 = perfectly disjoint files (best pruning), 1 = all files span the
    same range (no pruning possible)."""
    import itertools

    scores = []
    for (lo1, hi1), (lo2, hi2) in itertools.combinations(ranges, 2):
        inter = max(0.0, min(float(hi1), float(hi2)) - max(float(lo1), float(lo2)))
        union = max(float(hi1), float(hi2)) - min(float(lo1), float(lo2)) or 1.0
        scores.append(inter / union)
    return sum(scores) / len(scores)


def test_zorder_layout_clusters_both_columns(spark, tmp_path):
    """Z-ordered files must cluster BOTH columns far better than an
    unsorted write (which spans the whole domain in every file), and each
    column at least half as well as its dedicated single-column sort."""
    o = table(spark, SF, "orders").select("o_orderkey", "o_custkey", "o_totalprice")

    raw_dir, z_dir = str(tmp_path / "raw"), str(tmp_path / "zord")
    o.repartition(8).write.mode("overwrite").parquet(raw_dir)
    zorder_layout(o, "o_custkey", "o_totalprice").write.mode("overwrite").parquet(z_dir)

    for col in ("o_custkey", "o_totalprice"):
        raw_s = _overlap_score(_file_ranges(raw_dir, col))
        z_s = _overlap_score(_file_ranges(z_dir, col))
        assert z_s < raw_s * 0.55, f"{col}: zorder {z_s:.3f} !<< raw {raw_s:.3f}"


def test_sort_layout_disjoint_on_sort_column(spark, tmp_path):
    o = table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    out = str(tmp_path / "sorted")
    sort_layout(o, "o_totalprice").write.mode("overwrite").parquet(out)
    ranges = sorted(_file_ranges(out, "o_totalprice"))
    # range partitioning => consecutive files touch at most at boundaries
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2 + 1e-9


def test_schema_evolution_merge_read(spark, tmp_path):
    """Multi-writer tables accrete columns over years; mergeSchema reads
    old + new files as one table with nulls for missing columns — the
    reader-side half of the fixture-schema-drift lesson."""
    p = str(tmp_path / "tbl")
    spark.range(3).select(F.col("id").alias("k"), F.lit("a").alias("v1")).write.parquet(p + "/f1.parquet")
    spark.range(3, 6).select(
        F.col("id").alias("k"), F.lit("b").alias("v1"), F.lit(1.5).alias("v2")
    ).write.parquet(p + "/f2.parquet")
    df = spark.read.option("mergeSchema", "true").option("recursiveFileLookup", "true").parquet(p)
    assert set(df.columns) == {"k", "v1", "v2"}
    rows = {r["k"]: (r["v1"], r["v2"]) for r in df.collect()}
    assert rows[0] == ("a", None) and rows[5] == ("b", 1.5)
